"""Deployment utilities: model packaging, data-channel organization, and
(optional) AWS SageMaker wrappers.

Pure-Python pieces (packaging, channel prep) mirror the reference
``sagemaker/sagemaker_utils.py``: ``create_model_package`` (:23-60) and
``prepare_training_data`` (:522-585). The AWS-SDK estimator/endpoint/batch
wrappers (:63-472) are thin boto3/sagemaker-SDK glue; they are provided here
behind an import guard since this framework targets TPU serving first, and
the SDK is not part of the baked environment.
"""

from __future__ import annotations

import os
import shutil
import tarfile
from pathlib import Path
from typing import Dict, List, Optional


def create_model_package(
    model_dir: str,
    output_path: str = "model.tar.gz",
    extra_files: Optional[List[str]] = None,
) -> str:
    """Pack a run directory (checkpoints + inference/tokenizer assets) into a
    tar.gz deployable archive."""
    model_dir = Path(model_dir)
    if not model_dir.is_dir():
        raise FileNotFoundError(f"model dir not found: {model_dir}")
    with tarfile.open(output_path, "w:gz") as tar:
        for item in sorted(model_dir.rglob("*")):
            tar.add(item, arcname=item.relative_to(model_dir))
        for extra in extra_files or []:
            tar.add(extra, arcname=os.path.basename(extra))
    return output_path


def extract_model_package(archive_path: str, target_dir: str) -> str:
    with tarfile.open(archive_path, "r:gz") as tar:
        tar.extractall(target_dir, filter="data")
    return target_dir


def prepare_training_data(
    train_csv: str,
    val_csv: str,
    out_dir: str,
    test_csv: Optional[str] = None,
    image_dir: Optional[str] = None,
) -> Dict[str, str]:
    """Organize CSVs (+ images) into per-channel directories matching the
    entrypoint's channel layout (reference sagemaker_utils.py:522-585)."""
    out = Path(out_dir)
    channels: Dict[str, str] = {}

    def add(channel: str, csv_path: Optional[str]):
        if not csv_path:
            return
        ch_dir = out / channel
        ch_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy2(csv_path, ch_dir / "data.csv")
        channels[channel] = str(ch_dir)

    add("train", train_csv)
    add("validation", val_csv)
    add("test", test_csv)
    if image_dir and os.path.isdir(image_dir):
        img_out = out / "images"
        if not img_out.exists():
            shutil.copytree(image_dir, img_out)
        channels["images"] = str(img_out)
    return channels


def _require_sagemaker():
    try:
        import boto3  # noqa: F401
        import sagemaker  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "AWS deployment wrappers need the `sagemaker` and `boto3` "
            "packages, which are not part of this TPU environment. The "
            "serving handler (serving/handler.py) and entrypoint "
            "(serving/entrypoint.py) are cloud-agnostic and run anywhere."
        ) from e


class SageMakerTrainingJob:  # pragma: no cover - AWS-SDK glue
    """Estimator wrapper (reference sagemaker_utils.py:63-206)."""

    def __init__(self, role: str, instance_type: str = "ml.g4dn.xlarge", **kwargs):
        _require_sagemaker()
        import sagemaker
        from sagemaker.pytorch import PyTorch

        self.session = sagemaker.Session()
        self.estimator = PyTorch(
            entry_point="entrypoint.py",
            source_dir=os.path.dirname(__file__),
            role=role,
            instance_count=1,
            instance_type=instance_type,
            framework_version=kwargs.pop("framework_version", "2.1"),
            py_version=kwargs.pop("py_version", "py310"),
            hyperparameters=kwargs.pop("hyperparameters", {}),
            **kwargs,
        )

    def fit(self, channels: Dict[str, str], wait: bool = True):
        self.estimator.fit(channels, wait=wait)
        return self.estimator


class SageMakerEndpoint:  # pragma: no cover - AWS-SDK glue
    """Deploy/predict/delete wrapper (reference sagemaker_utils.py:209-368)."""

    def __init__(self, endpoint_name: str):
        _require_sagemaker()
        import boto3

        self.endpoint_name = endpoint_name
        self.runtime = boto3.client("sagemaker-runtime")
        self.client = boto3.client("sagemaker")

    def predict(self, payload: dict) -> dict:
        import json

        resp = self.runtime.invoke_endpoint(
            EndpointName=self.endpoint_name,
            ContentType="application/json",
            Body=json.dumps(payload),
        )
        return json.loads(resp["Body"].read())

    def delete(self):
        self.client.delete_endpoint(EndpointName=self.endpoint_name)
