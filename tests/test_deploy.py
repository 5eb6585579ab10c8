"""SageMaker deployment-utils tests with injected fake boto3 clients.

Covers the remainder of reference sagemaker/sagemaker_utils.py (:209-368
endpoint deploy, :371-472 batch transform, :479-519 S3 upload, :592-636 CLI)
— all pure logic exercised without AWS credentials.
"""

import io
import json
import os

import pytest

from multimodal_content_moderation_tpu.serving.deploy import (
    SageMakerBatchTransform,
    SageMakerEndpoint,
    build_endpoint_config_spec,
    build_model_spec,
    build_transform_job_spec,
    main as deploy_cli,
    upload_data_to_s3,
)


class FakeSMClient:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def record(**kwargs):
            self.calls.append((name, kwargs))
            return {}

        return record


class FakeRuntime:
    def __init__(self, response):
        self.response = response
        self.calls = []

    def invoke_endpoint(self, **kwargs):
        self.calls.append(kwargs)
        return {"Body": io.BytesIO(json.dumps(self.response).encode())}


def test_build_model_spec():
    spec = build_model_spec(
        "m", "img:latest", "s3://b/model.tar.gz", "arn:role", env={"A": "1"}
    )
    assert spec["ModelName"] == "m"
    assert spec["PrimaryContainer"]["ModelDataUrl"] == "s3://b/model.tar.gz"
    assert spec["PrimaryContainer"]["Environment"] == {"A": "1"}
    assert spec["ExecutionRoleArn"] == "arn:role"
    with pytest.raises(ValueError):
        build_model_spec("m", "img", "/local/path", "arn:role")


def test_build_endpoint_config_spec():
    spec = build_endpoint_config_spec("cfg", "m", "ml.g4dn.xlarge", 2)
    (variant,) = spec["ProductionVariants"]
    assert variant["ModelName"] == "m"
    assert variant["InitialInstanceCount"] == 2
    with pytest.raises(ValueError):
        build_endpoint_config_spec("cfg", "m", instance_count=0)


def test_build_transform_job_spec():
    spec = build_transform_job_spec(
        "job", "m", "s3://b/in", "s3://b/out", instance_count=3
    )
    assert spec["TransformInput"]["DataSource"]["S3DataSource"]["S3Uri"] == "s3://b/in"
    assert spec["TransformInput"]["SplitType"] == "Line"
    assert spec["TransformOutput"]["S3OutputPath"] == "s3://b/out"
    assert spec["TransformOutput"]["AssembleWith"] == "Line"
    assert spec["TransformResources"]["InstanceCount"] == 3
    with pytest.raises(ValueError):
        build_transform_job_spec("job", "m", "not-s3", "s3://b/out")


def test_endpoint_deploy_predict_delete():
    client = FakeSMClient()
    runtime = FakeRuntime({"predictions": {"racist": {"label": False}}})
    ep = SageMakerEndpoint("ep", client=client, runtime=runtime)
    ep.deploy("s3://b/model.tar.gz", "arn:role", "img:latest", wait=False)
    names = [c[0] for c in client.calls]
    assert names == ["create_model", "create_endpoint_config", "create_endpoint"]
    assert client.calls[0][1]["ModelName"] == "ep-model"
    assert client.calls[1][1]["EndpointConfigName"] == "ep-config"
    assert client.calls[2][1] == {
        "EndpointName": "ep",
        "EndpointConfigName": "ep-config",
    }

    out = ep.predict({"text": "hi"})
    assert out["predictions"]["racist"]["label"] is False
    assert runtime.calls[0]["EndpointName"] == "ep"
    assert json.loads(runtime.calls[0]["Body"]) == {"text": "hi"}

    ep.delete()
    names = [c[0] for c in client.calls[3:]]
    assert names == ["delete_endpoint", "delete_endpoint_config", "delete_model"]


def test_batch_transform_run():
    client = FakeSMClient()
    bt = SageMakerBatchTransform(
        "s3://b/model.tar.gz", "arn:role", image_uri="img", client=client
    )
    out = bt.run("s3://b/in.jsonl", "s3://b/out/", job_name="j1", wait=False)
    assert out == "s3://b/out/"
    names = [c[0] for c in client.calls]
    assert names == ["create_model", "create_transform_job"]
    job = client.calls[1][1]
    assert job["TransformJobName"] == "j1"
    assert job["ModelName"] == "j1-model"
    assert job["TransformInput"]["ContentType"] == "application/jsonlines"


def test_upload_data_to_s3(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "sub" / "b.csv").write_text("y")
    (tmp_path / "skip.txt").write_text("z")

    class FakeS3:
        def __init__(self):
            self.uploads = []

        def upload_file(self, local, bucket, key):
            self.uploads.append((local, bucket, key))

    s3 = FakeS3()
    uri = upload_data_to_s3(
        str(tmp_path), "bkt", "pre/fix/", include_patterns=["*.csv"], s3_client=s3
    )
    assert uri == "s3://bkt/pre/fix"
    keys = sorted(k for _, _, k in s3.uploads)
    assert keys == ["pre/fix/a.csv", f"pre/fix/{os.path.join('sub', 'b.csv')}"]
    assert all(b == "bkt" for _, b, _ in s3.uploads)


def test_deploy_cli_package_and_prepare(tmp_path, capsys):
    model_dir = tmp_path / "run"
    model_dir.mkdir()
    (model_dir / "inference_config.json").write_text("{}")
    out_tar = tmp_path / "model.tar.gz"
    deploy_cli(["package", "--model-dir", str(model_dir), "--output", str(out_tar)])
    assert out_tar.exists()
    assert "Created model package" in capsys.readouterr().out

    train = tmp_path / "train.csv"
    val = tmp_path / "val.csv"
    train.write_text("text,image_path,labels\nhi,,racist\n")
    val.write_text("text,image_path,labels\nhi,,racist\n")
    deploy_cli(
        [
            "prepare-data",
            "--train-csv", str(train),
            "--val-csv", str(val),
            "--output-dir", str(tmp_path / "channels"),
        ]
    )
    assert (tmp_path / "channels" / "train" / "data.csv").exists()
    assert (tmp_path / "channels" / "validation" / "data.csv").exists()
