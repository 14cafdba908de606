"""Packaging contract (round-13 verdict ask #5).

The engine must be installable: pyproject.toml metadata is valid and
in sync with the package, the console entry point resolves, the
package imports WITHOUT the repo as cwd (i.e. from an installed
copy), and setuptools actually packages the source tree (sdist build
— the wheel path needs the `wheel` package, absent here, and network
installs are off, so the sdist is the strongest offline build check).
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import tarfile
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject() -> dict:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        return tomllib.load(fh)


def test_metadata_valid_and_version_synced():
    meta = _pyproject()["project"]
    assert meta["name"] == "etl-tool-rep-spark"
    import etl_tool_rep_spark
    assert meta["version"] == etl_tool_rep_spark.__version__
    assert any(d.startswith("pyspark") for d in meta["dependencies"])
    # the gated connectors are extras, never hard deps
    extras = meta["optional-dependencies"]
    assert "paramiko" in extras["sftp"]
    assert "openpyxl" in extras["excel"]
    assert not any("paramiko" in d or "openpyxl" in d
                   for d in meta["dependencies"])


def test_console_script_target_resolves():
    (target,) = _pyproject()["project"]["scripts"].values()
    mod_name, func_name = target.split(":")
    fn = getattr(importlib.import_module(mod_name), func_name)
    assert callable(fn)


def test_package_imports_without_repo_cwd(tmp_path):
    # simulate an installed copy: some other cwd, repo on sys.path the
    # way site-packages would be — import must not depend on cwd
    env = {**os.environ, "PYTHONPATH": REPO}
    p = subprocess.run(
        [sys.executable, "-c",
         "import etl_tool_rep_spark\n"
         "from etl_tool_rep_spark.__main__ import main\n"
         "print(etl_tool_rep_spark.__version__)"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=120)
    assert p.returncode == 0, p.stderr
    assert p.stdout.strip() == _pyproject()["project"]["version"]


def test_cli_help_without_repo_cwd(tmp_path):
    env = {**os.environ, "PYTHONPATH": REPO}
    p = subprocess.run(
        [sys.executable, "-m", "etl_tool_rep_spark", "--help"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=120)
    assert p.returncode == 0, p.stderr
    assert "--pipeline" in p.stdout


def test_sdist_build_packages_the_source(tmp_path):
    pytest.importorskip("setuptools")
    p = subprocess.run(
        [sys.executable, "-c",
         "from setuptools import build_meta\n"
         f"print(build_meta.build_sdist({str(tmp_path)!r}))"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr
    name = p.stdout.strip().splitlines()[-1]
    with tarfile.open(os.path.join(tmp_path, name)) as tf:
        names = tf.getnames()
    root = name.removesuffix(".tar.gz")
    for want in (f"{root}/pyproject.toml",
                 f"{root}/etl_tool_rep_spark/__init__.py",
                 f"{root}/etl_tool_rep_spark/__main__.py",
                 f"{root}/etl_tool_rep_spark/engine.py",
                 f"{root}/etl_tool_rep_spark/queries/tier0.py"):
        assert want in names, f"sdist missing {want}"
    # tests/ and harness artifacts must NOT ship in the distribution
    assert not any("/tests/" in n or n.endswith("BENCH_SWEEP.json")
                   for n in names)
