"""Dataset preparation: Hateful Memes and MMHS150K.

Behavior-compatible with reference src/data/preprocessing.py:16-167,
including the MMHS150K label-index quirk: raw MMHS150K annotates
0=NotHate..5=OtherHate, but the reference maps index 0 -> "racist" and drops
index 5 (``0 <= idx < len(class_names)`` with 5 names,
preprocessing.py:150-153). The shipped CSVs were produced by that exact
mapping, so it is reproduced here verbatim — "fixing" it would break parity
with the published benchmark data.

The Hateful Memes download needs the HF hub (network); offline hosts pass an
existing snapshot dir instead (``--local_dir`` on the prepare-data CLI).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd

MMHS_CLASS_NAMES = ["racist", "sexist", "homophobe", "religion", "otherhate"]


def ensure_dir(p: Path) -> None:
    p.mkdir(parents=True, exist_ok=True)


def write_class_names(out_dir: Path, class_names: List[str]) -> None:
    with open(out_dir / "class_names.txt", "w", encoding="utf-8") as f:
        for c in class_names:
            f.write(c + "\n")


def _read_jsonl(path: Path) -> List[Dict]:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows


def download_and_prepare_hateful_memes(
    out_root: Path, local_repo: Optional[Path] = None
) -> None:
    """Emit Hateful Memes binary-label CSVs (train/val/test with columns
    text,image_path,label). Downloads the HF mirror unless ``local_repo``
    points at an existing snapshot (img/ + *.jsonl) — the offline path for
    air-gapped TPU hosts."""
    if local_repo is None:  # pragma: no cover - needs network
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise RuntimeError(
                "huggingface_hub is required for hateful_memes download; "
                "or pass a local snapshot dir (--local_dir)"
            ) from e

        print("==> Downloading Hateful Memes (HF mirror) ...")
        local_repo = Path(
            snapshot_download(
                repo_id="neuralcatcher/hateful_memes", repo_type="dataset"
            )
        )
    local_repo = Path(local_repo)

    out_dir = Path(out_root) / "hateful_memes"
    images_out = out_dir / "images"
    ensure_dir(images_out)

    src_img_dir = local_repo / "img"
    if not src_img_dir.exists():
        raise FileNotFoundError(f"Expected 'img' folder inside {local_repo}")
    if not any(images_out.iterdir()):
        shutil.copytree(src_img_dir, images_out, dirs_exist_ok=True)

    split_map = {
        "train.jsonl": "train.csv",
        "dev_seen.jsonl": "val.csv",
        "test_seen.jsonl": "test.csv",
    }
    for jsonl_name, csv_name in split_map.items():
        jsonl_path = local_repo / jsonl_name
        if not jsonl_path.exists():
            print(f"Warning: {jsonl_name} not found, skipping")
            continue
        records = [
            {
                "text": row.get("text", ""),
                "image_path": os.path.basename(row.get("img", "")),
                "label": int(row.get("label", 0)),
            }
            for row in _read_jsonl(jsonl_path)
        ]
        pd.DataFrame(records).to_csv(out_dir / csv_name, index=False)
        print(f"Saved {csv_name} with {len(records)} samples")

    write_class_names(out_dir, ["hateful"])
    print(f"==> Hateful Memes prepared at: {out_dir}")


def prepare_mmhs150k_from_raw(raw_dir: Path, out_dir: Path) -> None:
    """Convert raw MMHS150K (MMHS150K_GT.json + splits/*.txt) into
    multi-label CSVs, preserving the reference's label-index mapping."""
    raw_dir, out_dir = Path(raw_dir), Path(out_dir)
    gt_path = raw_dir / "MMHS150K_GT.json"
    if not gt_path.exists():
        raise FileNotFoundError(f"Ground truth file not found: {gt_path}")

    with open(gt_path, "r", encoding="utf-8") as f:
        gt = json.load(f)

    class_names = list(MMHS_CLASS_NAMES)
    ensure_dir(out_dir)
    ensure_dir(out_dir / "images")

    splits_dir = raw_dir / "splits"
    for split_name in ["train", "val", "test"]:
        split_file = splits_dir / f"{split_name}_ids.txt"
        if not split_file.exists():
            print(f"Warning: {split_file} not found, skipping")
            continue
        with open(split_file, "r") as f:
            ids = [line.strip() for line in f if line.strip()]

        records = []
        for img_id in ids:
            if img_id not in gt:
                continue
            entry = gt[img_id]
            # Quirk preserved: idx 0 maps to "racist" and idx 5 is dropped
            # (see module docstring; reference preprocessing.py:150-153).
            active = [
                class_names[idx]
                for idx in entry.get("labels", [])
                if 0 <= idx < len(class_names)
            ]
            records.append(
                {
                    "text": entry.get("tweet_text", ""),
                    "image_path": f"{img_id}.jpg",
                    "labels": ",".join(active) if active else "",
                }
            )
        pd.DataFrame(records).to_csv(out_dir / f"{split_name}.csv", index=False)
        print(f"Saved {split_name}.csv with {len(records)} samples")

    write_class_names(out_dir, class_names)
    print(f"==> MMHS150K prepared at: {out_dir}")
