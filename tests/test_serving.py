"""Serving-layer tests: JSON handler contract, JSONL batch transform,
containerized entrypoint plumbing, and packaging utilities."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_content_moderation_tpu.serving.deploy import (
    create_model_package,
    extract_model_package,
    prepare_training_data,
)
from multimodal_content_moderation_tpu.serving.entrypoint import (
    find_data_file,
    find_image_root,
)
from multimodal_content_moderation_tpu.serving.handler import (
    BatchTransformHandler,
    input_fn,
    model_fn,
    output_fn,
    predict_fn,
)


def _b64_image(seed=0, size=(40, 40)):
    g = np.random.default_rng(seed)
    arr = g.integers(0, 256, size=(*size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestInputFn:
    def test_single_object_wrapped(self):
        out = input_fn(json.dumps({"text": "hi"}))
        assert out == [{"text": "hi"}]

    def test_instances_list(self):
        body = json.dumps({"instances": [{"text": "a"}, {"text": "b"}]})
        assert len(input_fn(body)) == 2

    def test_bare_list(self):
        assert len(input_fn(json.dumps([{"text": "a"}]))) == 1

    def test_bad_content_type(self):
        with pytest.raises(ValueError):
            input_fn("{}", "text/csv")


@pytest.fixture(scope="module")
def classifier(trained_run):
    _, result = trained_run
    return model_fn(result["result"]["best_checkpoint"])


class TestPredictFn:
    def test_text_and_image(self, classifier):
        instances = [
            {"text": "hate hate hate", "image": _b64_image(0)},
            {"text": "love love love"},
        ]
        preds = predict_fn(instances, classifier)
        assert len(preds) == 2
        for p in preds:
            assert set(p.keys()) == {
                "class_predictions",
                "probabilities",
                "any_harmful",
            }
            assert set(p["probabilities"].keys()) == set(classifier.class_names)

    def test_corrupt_base64_degrades(self, classifier):
        preds = predict_fn([{"text": "x", "image": "!!!not-base64!!!"}], classifier)
        assert len(preds) == 1  # degraded to text-only, not an error

    def test_more_instances_than_batch(self, classifier):
        instances = [{"text": f"t{i}"} for i in range(classifier.batch_size + 3)]
        preds = predict_fn(instances, classifier)
        assert len(preds) == len(instances)

    def test_output_fn_roundtrip(self, classifier):
        preds = predict_fn([{"text": "hello"}], classifier)
        body = output_fn(preds)
        parsed = json.loads(body)
        assert "predictions" in parsed and len(parsed["predictions"]) == 1


class TestHTTPServer:
    """The standalone SageMaker-contract HTTP server (serving/server.py)."""

    @pytest.fixture(scope="class")
    def server(self, trained_run):
        import threading

        from multimodal_content_moderation_tpu.serving import server as srv

        _, result = trained_run
        # port 0 = let the OS pick a free port
        s = srv.serve(result["result"]["best_checkpoint"], port=0, host="127.0.0.1")
        t = threading.Thread(target=s.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{s.server_address[1]}"
        s.shutdown()

    def test_ping(self, server):
        import urllib.request

        with urllib.request.urlopen(f"{server}/ping", timeout=30) as r:
            assert r.status == 200

    def test_invocations_single_and_batch(self, server):
        import urllib.request

        body = json.dumps(
            {
                "instances": [
                    {"text": "hate hate hate", "image_base64": _b64_image(1)},
                    {"text": "love love love"},
                ]
            }
        ).encode()
        req = urllib.request.Request(
            f"{server}/invocations",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["predictions"]) == 2
        for p in out["predictions"]:
            assert set(p.keys()) == {
                "class_predictions",
                "probabilities",
                "any_harmful",
            }

    def test_concurrent_invocations_pipeline_correctly(self, server):
        """Host prep runs outside the device lock (server.py do_POST /
        handler.predict_fn device_lock), so concurrent requests pipeline —
        every response must still match its own sequential answer."""
        import threading
        import urllib.request

        def call(text, img):
            inst = {"text": text}
            if img is not None:
                inst["image_base64"] = img
            req = urllib.request.Request(
                f"{server}/invocations",
                data=json.dumps(inst).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["predictions"][0]["probabilities"]

        cases = [
            ("hate hate hate", _b64_image(1)),
            ("love love love", None),
            ("hate love", _b64_image(2)),
            ("", _b64_image(3)),
        ] * 2
        sequential = [call(t, i) for t, i in cases]

        results = [None] * len(cases)

        def worker(k):
            results[k] = call(*cases[k])

        threads = [
            threading.Thread(target=worker, args=(k,)) for k in range(len(cases))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for seq, conc in zip(sequential, results):
            assert conc is not None
            for name, p in seq.items():
                assert conc[name] == pytest.approx(p, abs=1e-6)

    def test_bad_json_is_400_not_crash(self, server):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{server}/invocations",
            data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        # server still healthy afterwards
        with urllib.request.urlopen(f"{server}/ping", timeout=30) as r:
            assert r.status == 200

    def test_unknown_route_404(self, server):
        import urllib.error
        import urllib.request

        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server}/nope", timeout=30)
        assert e.value.code == 404

    def test_model_failure_is_500_not_400(self):
        """Server-side faults must surface as 5xx — SageMaker's router treats
        4xx as client errors and would never mark the instance unhealthy or
        retry (contrast: malformed input stays 400, tested above)."""
        import threading
        import urllib.error
        import urllib.request
        from http.server import ThreadingHTTPServer

        from multimodal_content_moderation_tpu.serving.server import (
            _State,
            _make_request_handler,
        )

        state = _State()
        state.classifier = object()  # "loaded" as far as /ping is concerned

        def exploding_predict(instances):
            raise RuntimeError("device fault")

        state.batcher = exploding_predict
        s = ThreadingHTTPServer(("127.0.0.1", 0), _make_request_handler(state))
        t = threading.Thread(target=s.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{s.server_address[1]}"
            req = urllib.request.Request(
                f"{url}/invocations",
                data=json.dumps({"text": "hello"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 500
            assert "device fault" in json.loads(e.value.read())["error"]
            # malformed input on the same server is still a 400
            bad = urllib.request.Request(
                f"{url}/invocations",
                data=b"{not json",
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as e2:
                urllib.request.urlopen(bad, timeout=30)
            assert e2.value.code == 400
        finally:
            s.shutdown()


class TestBatchTransform:
    def test_jsonl_roundtrip(self, classifier, tmp_path):
        lines = [
            json.dumps({"text": "hate hate hate"}),
            "",  # blank line skipped
            "{bad json",
            json.dumps({"text": "love", "image": _b64_image(1)}),
        ]
        inp = tmp_path / "in.jsonl"
        outp = tmp_path / "out.jsonl"
        inp.write_text("\n".join(lines))
        BatchTransformHandler(classifier).process_file(str(inp), str(outp))
        out_lines = outp.read_text().strip().split("\n")
        assert len(out_lines) == 3  # blank dropped
        assert "error" in json.loads(out_lines[1])
        assert "any_harmful" in json.loads(out_lines[0])


class TestEntrypointPlumbing:
    def test_find_data_file_priority(self, tmp_path):
        (tmp_path / "other.csv").write_text("text\n")
        (tmp_path / "data.csv").write_text("text\n")
        assert find_data_file(str(tmp_path)).endswith("data.csv")
        os.remove(tmp_path / "data.csv")
        assert find_data_file(str(tmp_path)).endswith("other.csv")
        assert find_data_file(str(tmp_path / "missing")) is None

    def test_find_image_root(self, tmp_path):
        imgs = tmp_path / "images"
        imgs.mkdir()
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(imgs / "a.jpg")
        assert find_image_root(str(tmp_path)) == str(imgs)

    @pytest.mark.slow
    def test_entrypoint_trains(self, encoder_dir, data_dir, tmp_path):
        """Full containerized entrypoint: channels + flat flags -> artifacts."""
        from multimodal_content_moderation_tpu.serving.entrypoint import train

        ch = prepare_training_data(
            f"{data_dir}/train.csv",
            f"{data_dir}/val.csv",
            str(tmp_path / "channels"),
            image_dir=f"{data_dir}/images",
        )
        model_dir = str(tmp_path / "model")
        out_dir = str(tmp_path / "out")
        train(
            [
                "--train-dir", ch["train"],
                "--validation-dir", ch["validation"],
                "--images-dir", ch["images"],
                "--encoder-assets-dir", encoder_dir,
                "--model-dir", model_dir,
                "--output-data-dir", out_dir,
                "--epochs", "1",
                "--batch-size", "8",
                "--eval-batch-size", "8",
                "--max-text-length", "16",
                "--fusion-dim", "16",
            ]
        )
        assert os.path.exists(os.path.join(model_dir, "inference_config.json"))
        assert os.path.exists(os.path.join(out_dir, "hyperparameters.json"))
        assert os.path.exists(os.path.join(out_dir, "final_metrics.json"))


class TestPackaging:
    def test_package_roundtrip(self, tmp_path):
        src = tmp_path / "model"
        (src / "sub").mkdir(parents=True)
        (src / "inference_config.json").write_text("{}")
        (src / "sub" / "w.bin").write_bytes(b"\x00" * 16)
        archive = create_model_package(str(src), str(tmp_path / "model.tar.gz"))
        dest = tmp_path / "extracted"
        extract_model_package(archive, str(dest))
        assert (dest / "inference_config.json").exists()
        assert (dest / "sub" / "w.bin").exists()


def test_model_fn_env_engine(trained_run, monkeypatch):
    """MMHARM_ENGINE=fast must switch the endpoint to the u8 wire path and
    produce the same predictions as the standard path."""
    from multimodal_content_moderation_tpu.serving.handler import model_fn

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    monkeypatch.setenv("MMHARM_ENGINE", "fast")
    clf_fast = model_fn(ckpt)
    assert clf_fast.engine is not None
    monkeypatch.delenv("MMHARM_ENGINE")
    clf_std = model_fn(ckpt)
    assert clf_std.engine is None
    a = clf_std.predict("hate hate hate")
    b = clf_fast.predict("hate hate hate")
    for name in a["predictions"]:
        assert abs(
            a["predictions"][name]["probability"]
            - b["predictions"][name]["probability"]
        ) < 1e-3


def test_model_fn_env_seq_buckets(trained_run, monkeypatch):
    """MMHARM_SEQ_BUCKETS (fast engine + CLIP) must install the per-batch
    bucket ladder and leave the endpoint's probabilities exactly unchanged —
    truncation past EOS is dead compute (causal text tower + EOS pooling)."""
    from multimodal_content_moderation_tpu.serving.handler import model_fn

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    monkeypatch.setenv("MMHARM_ENGINE", "fast")
    monkeypatch.setenv("MMHARM_SEQ_BUCKETS", "6")
    clf_bkt = model_fn(ckpt)
    assert clf_bkt._bucket_ladder == [6, clf_bkt.max_len]
    monkeypatch.setenv("MMHARM_SEQ_BUCKETS", "off")
    clf_off = model_fn(ckpt)
    assert clf_off._bucket_ladder is None
    a = clf_off.predict("hate hate hate")
    b = clf_bkt.predict("hate hate hate")
    for name in a["predictions"]:
        assert abs(
            a["predictions"][name]["probability"]
            - b["predictions"][name]["probability"]
        ) < 1e-6


def test_handler_predict_fn_fast_engine(trained_run, data_dir, monkeypatch):
    """The full endpoint path (input_fn -> predict_fn -> output_fn) must work
    and agree with the standard engine when MMHARM_ENGINE=fast."""
    import base64

    from multimodal_content_moderation_tpu.serving.handler import (
        input_fn,
        model_fn,
        output_fn,
        predict_fn,
    )

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    with open(os.path.join(data_dir, "images", "im0.png"), "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    body = json.dumps(
        {"instances": [
            {"text": "hate hate hate", "image": b64},
            {"text": "love love love"},  # degraded: no image
        ]}
    )

    clf_std = model_fn(ckpt)
    monkeypatch.setenv("MMHARM_ENGINE", "fast")
    clf_fast = model_fn(ckpt)
    assert clf_fast.engine is not None

    preds_std = predict_fn(input_fn(body), clf_std)
    preds_fast = predict_fn(input_fn(body), clf_fast)
    assert len(preds_std) == len(preds_fast) == 2
    for a, b in zip(preds_std, preds_fast):
        for name in a["probabilities"]:
            assert abs(a["probabilities"][name] - b["probabilities"][name]) < 1e-3
    out = json.loads(output_fn(preds_fast))
    assert "predictions" in out and len(out["predictions"]) == 2


class TestMicroBatcher:
    def test_concurrent_requests_coalesce_and_route(self):
        import threading

        from multimodal_content_moderation_tpu.serving.server import MicroBatcher

        calls = []

        def predict(instances):
            calls.append(len(instances))
            return [{"echo": inst["x"]} for inst in instances]

        mb = MicroBatcher(predict, window_ms=60.0, max_batch=64)
        results = {}

        def client(cid):
            out = mb([{"x": f"{cid}-0"}, {"x": f"{cid}-1"}])
            results[cid] = out

        threads = [threading.Thread(target=client, args=(c,)) for c in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(results) == 4
        for cid, out in results.items():
            assert [o["echo"] for o in out] == [f"{cid}-0", f"{cid}-1"]
        # the 60 ms window coalesced concurrent requests into fewer device
        # calls than requests (usually exactly 1)
        assert len(calls) < 4
        assert max(calls) > 2

    def test_batch_requests_bypass_coalescing(self):
        """A request already carrying >= bypass_n instances must run on the
        CALLING thread, never through the worker queue (coalescing costs
        batch traffic ~20%, tools/bench_serving.py) — while small requests
        still coalesce (VERDICT r3 #3 adaptive policy)."""
        import threading

        from multimodal_content_moderation_tpu.serving.server import MicroBatcher

        call_threads = []

        def predict(instances):
            call_threads.append((threading.current_thread(), len(instances)))
            return [{"echo": inst["x"]} for inst in instances]

        mb = MicroBatcher(predict, window_ms=20.0, max_batch=64, bypass_n=4)

        big = [{"x": i} for i in range(6)]  # >= bypass_n: direct path
        out = mb(big)
        assert [o["echo"] for o in out] == list(range(6))
        th, n = call_threads[-1]
        assert th is threading.current_thread() and n == 6

        out_small = mb([{"x": "s"}])  # < bypass_n: worker path
        assert out_small == [{"echo": "s"}]
        th, n = call_threads[-1]
        assert th is not threading.current_thread() and n == 1

        # bypass_n=0 disables bypassing entirely
        mb0 = MicroBatcher(predict, window_ms=5.0, bypass_n=0)
        mb0(big)
        th, _ = call_threads[-1]
        assert th is not threading.current_thread()

    def test_error_fans_out_to_all_waiters(self):
        import threading

        from multimodal_content_moderation_tpu.serving.server import MicroBatcher

        def predict(instances):
            raise RuntimeError("device fell over")

        mb = MicroBatcher(predict, window_ms=30.0)
        errs = []

        def client():
            try:
                mb([{"x": 1}])
            except RuntimeError as e:
                errs.append(str(e))

        threads = [threading.Thread(target=client) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert errs == ["device fell over"] * 3



def test_model_fn_prewarm(trained_run, monkeypatch):
    """model_fn pre-compiles every ladder rung at load time (ADVICE r3: lazy
    per-bucket compiles under the device lock spike early p99); warmup()
    reports one shape per text width and MMHARM_PREWARM=0 opts out."""
    from multimodal_content_moderation_tpu.serving.handler import model_fn

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    monkeypatch.setenv("MMHARM_ENGINE", "fast")
    monkeypatch.setenv("MMHARM_SEQ_BUCKETS", "4,6")
    clf = model_fn(ckpt)
    # ladder = [4, 6, max_len]; warmup already ran inside model_fn — calling
    # it again must hit the jit cache and report the same shape count
    assert clf.warmup() == len(clf._bucket_ladder) == 3

    monkeypatch.setenv("MMHARM_PREWARM", "0")
    monkeypatch.setenv("MMHARM_SEQ_BUCKETS", "off")
    clf2 = model_fn(ckpt)
    assert clf2._bucket_ladder is None
    assert clf2.warmup() == 1  # standard width only
