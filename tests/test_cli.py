"""CLI surface tests (reference: cmd/quiver/main.go subcommands).

Covers layered config resolution (file < env < flag), backup/restore/info
round-trips through the click runner, and JWT minting. ``serve`` is
exercised end-to-end by tests/test_api.py against the server object; the
blocking command itself is not run here.
"""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from quiver_tpu.cli import cli, load_config


@pytest.fixture
def runner():
    return CliRunner()


def _seed(data_dir: str) -> None:
    from quiver_tpu.core.db import DB, DBOptions

    db = DB(DBOptions(storage_path=data_dir))
    c = db.create_collection("docs", dim=8, metric="euclidean")
    vecs = np.random.default_rng(0).normal(size=(32, 8)).astype(np.float32)
    c.add_batch([f"d{i}" for i in range(32)], vecs)
    db.close()  # close flushes


def test_load_config_layering(tmp_path, monkeypatch):
    cfg_file = tmp_path / "quiver.yaml"
    cfg_file.write_text("port: 1234\nlog_level: debug\nunknown_key: 7\n")
    monkeypatch.setenv("QUIVER_PORT", "4321")
    cfg = load_config(str(cfg_file))
    assert cfg["port"] == 4321  # env beats file
    assert cfg["log_level"] == "debug"  # file beats default
    assert "unknown_key" not in cfg  # unknown keys are not adopted
    monkeypatch.delenv("QUIVER_PORT")
    assert load_config(str(cfg_file))["port"] == 1234


def test_load_config_bool_env(monkeypatch):
    monkeypatch.setenv("QUIVER_ENABLE_AUTH", "true")
    assert load_config("/nonexistent.yaml")["enable_auth"] is True
    monkeypatch.setenv("QUIVER_ENABLE_AUTH", "0")
    assert load_config("/nonexistent.yaml")["enable_auth"] is False


def test_info_reports_collections(tmp_path, runner):
    data = str(tmp_path / "data")
    _seed(data)
    res = runner.invoke(cli, ["--log-level", "error", "--data-dir", data, "info"])
    assert res.exit_code == 0, res.output
    out = json.loads(res.output)
    assert out["collections"]["docs"]["vectors"] == 32
    assert out["collections"]["docs"]["dimension"] == 8


def test_backup_restore_roundtrip(tmp_path, runner):
    data = str(tmp_path / "data")
    backup_dir = str(tmp_path / "bak")
    _seed(data)
    res = runner.invoke(cli, ["--data-dir", data, "backup", backup_dir])
    assert res.exit_code == 0, res.output
    assert os.path.isdir(backup_dir)

    data2 = str(tmp_path / "data2")
    res = runner.invoke(cli, ["--data-dir", data2, "restore", backup_dir])
    assert res.exit_code == 0, res.output
    assert "docs" in res.output

    res = runner.invoke(cli, ["--log-level", "error", "--data-dir", data2, "info"])
    assert json.loads(res.output)["collections"]["docs"]["vectors"] == 32


def test_token_mints_verifiable_jwt(runner):
    from quiver_tpu.api.auth import jwt_decode

    res = runner.invoke(
        cli, ["token", "--secret", "s3cret", "--sub", "alice", "--ttl", "60"]
    )
    assert res.exit_code == 0, res.output
    claims = jwt_decode(res.output.strip(), "s3cret")
    assert claims["sub"] == "alice"
