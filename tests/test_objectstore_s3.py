"""Object-store integration against a real (mocked) S3 API.

The reference's whole test identity is moto-mocked S3
(``tests/test_s3.py:11,25`` — ``@mock_s3`` on every class). These tests
exercise the same surface here: boto3 listing with server-side prefix /
client-side suffix / ContinuationToken pagination, a bytes round trip
through a live S3 API, and the engine's S3A credential wiring.

The executor-side data plane (``spark.read`` over ``s3a://``) needs the
hadoop-aws jars, which this image does not ship; the final test drives
that path against a moto *server* and self-skips with a clear reason
until the jars are provisioned — the code path is ready, not dead.
"""

from __future__ import annotations

import os

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from pandas_aws_spark.objectstore import list_keys_boto, read_df, write_df
from pandas_aws_spark.session import s3a_credential_conf

_BUCKET = "graft-test-bucket"


@pytest.fixture()
def s3():
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=_BUCKET)
        yield client


def test_list_keys_boto_prefix_suffix_pagination(s3):
    """Mirror of the reference listing tests (tests/test_s3.py:51-91):
    server-side prefix, client-side suffix, and transparent pagination
    (MaxKeys=1 forces one ListObjectsV2 round trip per key)."""
    keys = [
        "logs/2024/a.csv",
        "logs/2024/b.csv",
        "logs/2024/c.parquet",
        "logs/2025/d.csv",
        "other/e.csv",
    ]
    for k in keys:
        s3.put_object(Bucket=_BUCKET, Key=k, Body=b"x")

    assert sorted(list_keys_boto(s3, _BUCKET)) == sorted(keys)
    assert sorted(list_keys_boto(s3, _BUCKET, prefix="logs/2024/")) == keys[:3]
    assert sorted(list_keys_boto(s3, _BUCKET, prefix="logs/", suffix=".csv")) == [
        "logs/2024/a.csv",
        "logs/2024/b.csv",
        "logs/2025/d.csv",
    ]
    # pagination: MaxKeys=1 still yields everything, via ContinuationToken
    assert sorted(list_keys_boto(s3, _BUCKET, MaxKeys=1)) == sorted(keys)
    assert list(list_keys_boto(s3, _BUCKET, prefix="nope/")) == []


def test_bytes_roundtrip_through_s3_api(s3, spark, tmp_path):
    """Engine-written files survive a real S3 put/list/get cycle intact:
    write csv.gz with Spark, upload the parts via boto3 (the reference's
    put_df transport), list them back with prefix+suffix, download, and
    re-read with Spark — frames equal. This is the reference's
    write->read round-trip pattern (tests/test_s3.py:163-183) run
    against a live S3 API instead of the local filesystem."""
    df = spark.createDataFrame(
        [(3, "a"), (2, "b"), (1, "c"), (0, "d")], "col_1 int, col_2 string"
    )
    local = tmp_path / "out"
    write_df(df, f"file://{local}", format="csv", compression="gzip")

    uploaded = []
    for fname in sorted(os.listdir(local)):
        if fname.startswith("part-"):
            key = f"stage/run1/{fname}"
            with open(local / fname, "rb") as fh:
                s3.put_object(Bucket=_BUCKET, Key=key, Body=fh.read())
            uploaded.append(key)
    assert uploaded, "no part files written"

    listed = list(list_keys_boto(s3, _BUCKET, prefix="stage/run1/", suffix=".csv.gz"))
    assert listed == uploaded

    fetched = tmp_path / "back"
    fetched.mkdir()
    for key in listed:
        body = s3.get_object(Bucket=_BUCKET, Key=key)["Body"].read()
        (fetched / key.rsplit("/", 1)[-1]).write_bytes(body)

    back = read_df(spark, f"file://{fetched}", format="csv")
    assert sorted(back.collect()) == sorted(df.collect())


def test_s3a_credential_conf_modes():
    """The three auth modes of the reference's COPY builder
    (redshift.py:145-156), as S3A conf. Pure-dict check — getOrCreate
    would silently reuse the test session and skip fresh conf."""
    keys = s3a_credential_conf(aws_access_key_id="AK", aws_secret_access_key="SK")
    assert keys["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert keys["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )
    tmp = s3a_credential_conf(
        aws_access_key_id="AK", aws_secret_access_key="SK", aws_session_token="TOK"
    )
    assert tmp["spark.hadoop.fs.s3a.session.token"] == "TOK"
    assert tmp["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    role = s3a_credential_conf(aws_role_arn="arn:aws:iam::1:role/r")
    assert role["spark.hadoop.fs.s3a.assumed.role.arn"] == "arn:aws:iam::1:role/r"
    assert role["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AssumedRoleCredentialProvider"
    )
    # precedence: explicit keys win over role
    both = s3a_credential_conf(
        aws_access_key_id="AK", aws_secret_access_key="SK", aws_role_arn="arn:x"
    )
    assert "spark.hadoop.fs.s3a.assumed.role.arn" not in both
    # profile mode is PURE: returned as an env: entry for get_spark to
    # apply, never written to os.environ by the helper itself
    import os

    before = os.environ.get("AWS_PROFILE")
    prof = s3a_credential_conf(aws_profile="analytics")
    assert prof == {"env:AWS_PROFILE": "analytics"}
    assert os.environ.get("AWS_PROFILE") == before


def _jvm_has_s3a(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def test_s3a_read_write_against_moto_server(spark, tmp_path):
    """Full executor-side s3a:// round trip against a moto server.
    Activates automatically once hadoop-aws is on the classpath; until
    then skips (this image ships pyspark without the AWS connector
    jars, so the JVM cannot open s3a:// URIs at all).

    Provisioning was attempted and is impossible here: no hadoop-aws /
    aws-sdk jar exists anywhere on the image (no ivy/m2 caches), and
    the build host has no network route to Maven Central (DNS fails),
    so ``spark.jars.packages`` cannot fetch it either. The boto3
    control plane (listing, pagination, bytes, credential wiring) IS
    covered against moto above — only the executor data plane awaits
    an image with the connector jars."""
    if not _jvm_has_s3a(spark):
        pytest.skip(
            "hadoop-aws (org.apache.hadoop.fs.s3a.S3AFileSystem) not on the "
            "JVM classpath in this image; s3a data-plane test activates when "
            "the connector jars are provisioned"
        )
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    try:
        host, port = server.get_host_and_port()
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.endpoint", f"http://{host}:{port}")
        hconf.set("fs.s3a.path.style.access", "true")
        hconf.set("fs.s3a.access.key", "testing")
        hconf.set("fs.s3a.secret.key", "testing")
        hconf.set("fs.s3a.connection.ssl.enabled", "false")
        client = boto3.client(
            "s3",
            region_name="us-east-1",
            endpoint_url=f"http://{host}:{port}",
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
        )
        client.create_bucket(Bucket=_BUCKET)
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        write_df(df, f"s3a://{_BUCKET}/t", format="parquet")
        back = read_df(spark, f"s3a://{_BUCKET}/t", format="parquet")
        assert sorted(back.collect()) == sorted(df.collect())
    finally:
        server.stop()
