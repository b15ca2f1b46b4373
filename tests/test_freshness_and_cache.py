"""Unit tests for the round-5 assurance/ergonomics helpers:
utils/freshness.py (shared slow-tier fingerprint + bench recording gate)
and utils/compile_cache.py (persistent-cache enabling in the CLIs)."""

import json
import os

from a_robust_registration_loss_tpu.utils import freshness


class TestFreshness:
    def test_fingerprint_is_stable_and_content_sensitive(self, tmp_path):
        a = freshness.source_fingerprint()
        b = freshness.source_fingerprint()
        assert a == b and len(a) == 64

    def test_stamp_status_fresh_and_stale(self, tmp_path, monkeypatch):
        stamp = tmp_path / "stamp.json"
        monkeypatch.setattr(freshness, "SLOW_STAMP", str(stamp))
        st = freshness.stamp_status()
        assert not st["fresh"] and "no slow-tier stamp" in st["reason"]
        stamp.write_text(json.dumps(
            {"fingerprint": freshness.source_fingerprint(), "time": "t"}))
        assert freshness.stamp_status()["fresh"]
        stamp.write_text(json.dumps({"fingerprint": "bogus", "time": "t"}))
        st = freshness.stamp_status()
        assert not st["fresh"] and "source changed" in st["reason"]

    def test_conftest_and_package_agree(self):
        # conftest re-exports the package definition — one hash, two users
        import conftest

        assert conftest.source_fingerprint is freshness.source_fingerprint
        assert conftest.SLOW_STAMP == freshness.SLOW_STAMP

    def test_bench_refuses_stale_stamp(self, tmp_path):
        """bench.py must exit nonzero with an error JSON (no recorded value)
        when the stamp is stale — the round-4 'shipped red' hole."""
        import subprocess
        import sys

        env = dict(os.environ)
        env["PYTHONPATH"] = freshness.REPO_ROOT
        # point the gate at a stale stamp via a tiny shim
        shim = tmp_path / "shim.py"
        shim.write_text(
            "import sys\n"
            f"sys.path.insert(0, {freshness.REPO_ROOT!r})\n"
            "from a_robust_registration_loss_tpu.utils import freshness\n"
            f"freshness.SLOW_STAMP = {str(tmp_path / 'nope.json')!r}\n"
            "import bench\n"
            "try:\n"
            "    bench.main()\n"
            "except SystemExit as e:\n"
            "    sys.exit(e.code)\n")
        proc = subprocess.run([sys.executable, str(shim)], env=env,
                              capture_output=True, text=True, timeout=120)
        assert proc.returncode == 1, proc.stdout + proc.stderr
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rec["value"] is None and "refusing to record" in rec["error"]


class TestCompileCache:
    def test_enable_returns_dir_and_configures(self, tmp_path, monkeypatch):
        import jax

        from a_robust_registration_loss_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        target = tmp_path / "cache"
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(target))
        prev = jax.config.jax_compilation_cache_dir
        try:
            out = enable_persistent_cache()
            assert out == str(target) and os.path.isdir(target)
            assert jax.config.jax_compilation_cache_dir == str(target)
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
