"""SFTP connector — parity with the reference's ``sftp_action``
(reference main.py:97-126): extract (remote file -> local staging ->
spark.read) and load (DataFrame -> CSV -> remote put).

Driver-side by design, like the reference. The scale boundary is
explicit: SFTP is a control-plane ingestion edge for small operational
files. Big data should land on object storage/HDFS and be read
directly by executors; for bulk SFTP sources, stage with a dedicated
transfer fleet (or distcp) first, then ``spark.read`` the staging
area.

Gated: paramiko is not installed in this environment — functions
raise NotImplementedError with a clear message rather than failing at
import.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

try:
    import paramiko
    _HAS_PARAMIKO = True
except ImportError:
    _HAS_PARAMIKO = False


def _client(host: str, port: int, username: str, password: str):
    if not _HAS_PARAMIKO:
        raise NotImplementedError(
            "SFTP needs paramiko (not installed in this environment)")
    ssh = paramiko.SSHClient()
    ssh.set_missing_host_key_policy(paramiko.AutoAddPolicy())
    ssh.connect(host, port=port, username=username, password=password)
    return ssh


def sftp_extract(spark: SparkSession, host: str, port: int, username: str,
                 password: str, remote_path: str,
                 staging_dir: str | None = None) -> DataFrame:
    """Fetch a remote file to a local staging path, then smart_load it
    (reference main.py:97-113 'extract' branch)."""
    from .readers import smart_load
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="sftp_stage_")
    os.makedirs(staging_dir, exist_ok=True)
    local = os.path.join(staging_dir, os.path.basename(remote_path))
    ssh = _client(host, port, username, password)
    try:
        sftp = ssh.open_sftp()
        sftp.get(remote_path, local)
        sftp.close()
    finally:
        ssh.close()
    return smart_load(spark, local)


def sftp_load(df: DataFrame, host: str, port: int, username: str,
              password: str, remote_path: str) -> None:
    """Serialize a (small) result to one CSV and push it (reference
    main.py:115-122 'load' branch). Collects to the driver — bounded
    outputs only; large results belong on object storage."""
    import glob
    import shutil
    staging = tempfile.mkdtemp(prefix="sftp_out_")
    try:
        out_dir = os.path.join(staging, "csv")
        df.coalesce(1).write.option("header", True).csv(out_dir)
        part = glob.glob(os.path.join(out_dir, "part-*.csv"))[0]
        ssh = _client(host, port, username, password)
        try:
            sftp = ssh.open_sftp()
            sftp.put(part, remote_path)
            sftp.close()
        finally:
            ssh.close()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
