"""Deliverability tests for the bench orchestrator (VERDICT r2 item 1).

The round-2 record was lost because one slow leg blew the driver budget
before the headline JSON printed. These tests drive bench.main() with a
stubbed leg runner to pin the scheduling contract:

  * a non-empty JSON line prints even when the target-N leg times out
    (insurance-first: the N=2048 rung is banked before the gamble);
  * the headline upgrades to the target N when it lands;
  * corrupt (truncated-zstd) compile-cache entries are purged at startup.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
  spec = importlib.util.spec_from_file_location(
      "bench_under_test", os.path.join(REPO, "bench.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  # Keep cache healing away from the real .jax_cache (the real function is
  # exercised by TestCacheHealing against a tmp dir).
  mod._orig_heal = mod.heal_compile_cache
  monkeypatch.setattr(mod, "heal_compile_cache", lambda: None)
  monkeypatch.setenv("SCT_BENCH_DEADLINE_S", "500")
  monkeypatch.delenv("SCT_BENCH_LEG", raising=False)
  monkeypatch.delenv("SCT_BENCH_SOLVER", raising=False)
  monkeypatch.delenv("SCT_BENCH_N", raising=False)
  monkeypatch.delenv("SCT_BENCH_SAVE_WARM", raising=False)
  return mod


def _entry(latency=0.15):
  return {"latency_s": latency, "compile_s": 1.0, "n_clusters": 2,
          "parity": True, "staged": True, "backend": "stub"}


def _run_main(bench, capsys):
  bench.main()
  out = capsys.readouterr().out.strip().splitlines()
  return json.loads(out[-1])


class TestInsuranceFirst:

  def test_record_survives_target_timeout(self, bench, capsys, monkeypatch):
    calls = []

    def stub(n, solver, timeout_s, tag=None):
      calls.append((n, solver, timeout_s))
      if n >= 10240:
        return None, f"timeout after {timeout_s:.0f}s"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    # The post-gamble ladder upgraded the banked 2048 insurance to 4096
    # (ADVICE r3: intermediate rungs are tried while budget remains).
    assert meta["value"] > 0
    assert meta["parity"] is True
    assert "N4096" in meta["metric"]
    assert "degraded" in meta["solvers"]["SubspaceIteration"]
    # Insurance ran before the target and with a bounded cap.
    assert calls[0][0] == 2048
    assert calls[0][2] <= bench._INSURANCE_CAP_S + 1e-6
    assert calls[1][0] == 10240
    # The failed-attempt trail is preserved in the record (ADVICE r3).
    attempts = meta["solvers"]["SubspaceIteration"]["attempts"]
    assert any("timeout" in v for v in attempts.values())

  def test_headline_upgrades_when_target_lands(self, bench, capsys,
                                               monkeypatch):
    def stub(n, solver, timeout_s, tag=None):
      return dict(_entry(latency=0.15 if n >= 10240 else 0.5)), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert "N10240" in meta["metric"]
    assert "degraded" not in meta["solvers"]["SubspaceIteration"]
    # The exact-parity ladder is TARGET-FIRST (r4: the D&C target compiles
    # ~3x faster than any <=8192 full-eigh rung): when the target lands,
    # no insurance rung is spent.
    assert meta["solvers"]["full_eigh"]["n"] == 10240
    assert "rungs" not in meta["solvers"]["full_eigh"]

  def test_all_legs_failing_still_prints_json(self, bench, capsys,
                                              monkeypatch):
    monkeypatch.setattr(bench, "run_leg_subprocess",
                        lambda n, s, t, tag=None: (None, "rc=1"))
    with pytest.raises(SystemExit):
      bench.main()
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["value"] == 0.0
    assert "error" in meta

  def test_ladder_walks_even_when_insurance_failed(self, bench, capsys,
                                                   monkeypatch):
    """VERDICT r3 item 3: insurance timeout + target timeout must still
    produce a non-empty record via the ladder walk (round 3's scheduler
    only walked the ladder when NOTHING was banked *and* skipped it when
    insurance had failed before a failed target)."""
    calls = []

    def stub(n, solver, timeout_s, tag=None):
      calls.append((n, solver))
      if solver == "SubspaceIteration" and n in (2048, 10240):
        return None, f"timeout after {timeout_s:.0f}s"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert meta["value"] > 0
    # The ladder walked and banked SubspaceIteration@4096...
    assert (4096, "SubspaceIteration") in calls
    assert meta["solvers"]["SubspaceIteration"]["n"] == 4096
    # ...and the exact-parity ladder still aimed at (and landed) the true
    # target, which headlines as the largest-N measurement.
    assert "N10240_full_eigh" in meta["metric"]

  def test_full_eigh_ladder_banks_insurance_on_target_timeout(
      self, bench, capsys, monkeypatch):
    """VERDICT r3 item 1: a full_eigh target timeout degrades to the
    banked N=4096 exact measurement instead of a bare failure string."""
    def stub(n, solver, timeout_s, tag=None):
      if solver is None and n >= 10240:   # full_eigh target always dies
        return None, f"timeout after {timeout_s:.0f}s"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    fe = meta["solvers"]["full_eigh"]
    assert fe["n"] == 4096
    assert fe["parity"] is True
    assert fe["latency_s"] > 0
    # Both target attempts (initial + cache-resume retry) left a trail.
    assert "retry" in fe["attempts"]["N10240"]

  def test_headline_falls_back_to_other_solver(self, bench, capsys,
                                               monkeypatch):
    """If the headline solver banks nothing but full_eigh lands, the
    record carries the full_eigh number rather than erroring out."""
    def stub(n, solver, timeout_s, tag=None):
      if solver == "SubspaceIteration":
        return None, "rc=1"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert meta["value"] > 0
    assert "full_eigh" in meta["metric"]

  def test_large_cross_solver_result_outranks_small_headline_rung(
      self, bench, capsys, monkeypatch):
    """A full-size full_eigh result must headline over a tiny degraded
    rung of the nominal headline solver (largest-N-first selection)."""
    def stub(n, solver, timeout_s, tag=None):
      if solver == "SubspaceIteration" and n > 1024:
        return None, f"timeout after {timeout_s:.0f}s"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert "N10240_full_eigh" in meta["metric"]
    # The headline solver's salvaged small rung is still in the record.
    assert meta["solvers"]["SubspaceIteration"]["n"] == 1024

  def test_final_pass_salvages_headline_after_reserve_release(
      self, bench, capsys, monkeypatch):
    """When the pre-full_eigh ladder was budget-skipped, the final pass
    (reserve released) retries the headline solver's small rungs."""
    calls = []

    def stub(n, solver, timeout_s, tag=None):
      calls.append((n, solver, round(timeout_s)))
      if solver == "SubspaceIteration" and n > 1024:
        return None, f"timeout after {timeout_s:.0f}s"
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    _run_main(bench, capsys)
    assert (1024, "SubspaceIteration") in [(n, s) for n, s, _ in calls]


class TestTightBudget:

  def test_tight_deadline_still_attempts_headline(self, bench, capsys,
                                                  monkeypatch):
    """A deadline smaller than the nominal exact-parity reserve must not
    starve the headline solver (the reserve scales with the budget)."""
    monkeypatch.setenv("SCT_BENCH_DEADLINE_S", "200")
    calls = []

    def stub(n, solver, timeout_s, tag=None):
      calls.append((n, solver))
      return dict(_entry()), None

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert any(s == "SubspaceIteration" and n == 10240 for n, s in calls)
    assert meta["value"] > 0


class TestScratchHarvest:

  def test_partial_measurement_survives_leg_timeout(self, bench, capsys,
                                                    monkeypatch, tmp_path):
    """VERDICT r3 item 1a: a leg killed mid-repeats still banks the
    samples it streamed to scratch."""
    monkeypatch.setattr(bench, "_SCRATCH_DIR", str(tmp_path))
    monkeypatch.setenv("SCT_BENCH_SOLVER", "SubspaceIteration")
    monkeypatch.setenv("SCT_BENCH_N", "2048")

    def stub(n, solver, timeout_s, tag=None):
      # Simulate the leg dying after writing two samples to scratch.
      bench._write_scratch(
          bench._scratch_path(tag or solver, n),
          {"compile_s": 120.0, "n_clusters": 2, "parity": True,
           "staged": True, "backend": "stub", "samples": [0.2, 0.22]})
      return None, "timeout after 300s"

    monkeypatch.setattr(bench, "run_leg_subprocess", stub)
    meta = _run_main(bench, capsys)
    assert meta["value"] > 0
    assert "N2048" in meta["metric"]
    entry = meta["solvers"]["SubspaceIteration"]
    assert entry["latency_s"] == pytest.approx(0.21)
    assert "partial" in entry

  def test_stale_scratch_is_cleared_at_startup(self, bench, capsys,
                                               monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_SCRATCH_DIR", str(tmp_path))
    monkeypatch.setenv("SCT_BENCH_SOLVER", "SubspaceIteration")
    monkeypatch.setenv("SCT_BENCH_N", "2048")
    # A stale scratch file from a previous run...
    bench._write_scratch(
        bench._scratch_path("SubspaceIteration", 2048),
        {"compile_s": 1.0, "n_clusters": 9, "parity": False,
         "staged": True, "backend": "stale", "samples": [9.9]})
    # ...must NOT be harvested into this run's record.
    monkeypatch.setattr(bench, "run_leg_subprocess",
                        lambda n, s, t, tag=None: (None, "rc=1"))
    with pytest.raises(SystemExit):
      bench.main()
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["value"] == 0.0


class TestLegScratchStreaming:

  def test_run_leg_streams_samples_to_scratch(self, bench, tmp_path,
                                              monkeypatch):
    """The leg writes every completed sample to scratch as it happens —
    the property the orchestrator's harvest depends on."""
    import json as _json
    scratch = tmp_path / "leg.json"
    out = bench.run_leg(64, "SubspaceIteration", repeats=2,
                        scratch_path=str(scratch))
    assert out["latency_s"] > 0
    assert out["n_clusters"] >= 1
    payload = _json.loads(scratch.read_text())
    assert len(payload["samples"]) == 2
    assert payload["compile_s"] == out["compile_s"]


class TestCacheHealing:

  def test_purges_truncated_zstd_entries(self, bench, tmp_path, monkeypatch):
    zstandard = pytest.importorskip("zstandard")
    cache = tmp_path / "cache"
    cache.mkdir()
    good = cache / "jit_good-cache"
    good.write_bytes(zstandard.ZstdCompressor().compress(os.urandom(4096)))
    assert len(good.read_bytes()) > 100  # incompressible -> a real frame
    bad = cache / "jit_bad-cache"
    bad.write_bytes(good.read_bytes()[:100])  # truncated frame
    monkeypatch.setattr(bench, "CACHE_DIR", str(cache))
    monkeypatch.setattr(bench, "WARM_CACHE_DIR", str(tmp_path / "absent"))
    bench._orig_heal()
    assert good.exists()
    assert not bad.exists()
