"""Endpoint bars over the committed convergence artifacts
(benchmarks/TRAINING_*.json, produced by benchmarks/train_convergence.py).

The reference's only committed training evidence is the FMR curve
(fmr/result/fmr_training.log: train 0.597 -> 0.164, val 0.0361 -> 0.00356
over 1,559 epochs). These tests hold our recorded runs to analogous bars:
the losses must actually converge (not just trend), and the final held-out
accuracy endpoints must be registration-grade.

Skipped only when an artifact has not been generated yet (fresh clone).
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(os.path.dirname(HERE), "benchmarks")


def _load(name):
    path = os.path.join(BENCH, f"TRAINING_{name}.json")
    if not os.path.exists(path):
        pytest.skip(f"{path} not generated (run benchmarks/train_convergence.py)")
    with open(path) as f:
        return json.load(f)


def _curve(art, key):
    c = np.asarray(art["per_epoch"][key], np.float64)
    return c[np.isfinite(c)]


class TestFMRConvergence:
    def test_epochs_match_reference_protocol(self):
        art = _load("fmr")
        assert art["epochs"] == 1559  # fmr_training.log length
        assert len(art["per_epoch"]["epoch"]) == 1559

    def test_train_loss_converges(self):
        art = _load("fmr")
        loss = _curve(art, "loss")
        # reference shape: 0.597 -> 0.164 (3.6x); ours must drop >= 3x too
        assert loss[-1] < loss[0] / 3.0, (loss[0], loss[-1])
        # converged tail: the last 10% mean is within 20% of the best
        tail = loss[-len(loss) // 10:].mean()
        assert tail < 1.2 * loss.min() + 1e-6

    def test_val_loss_improves(self):
        art = _load("fmr")
        val = _curve(art, "test_loss")
        assert val[-1] < val[0], (val[0], val[-1])

    def test_final_eval_endpoints(self):
        art = _load("fmr")
        f = art["final"]
        assert np.isfinite(f["mean_dm"]) and f["mean_dm"] < 0.2
        assert f["test_loss_rot_euler_rmse"] < 5.0   # degrees
        assert f["test_loss_pp_wise"] < 0.1


class TestFMRAblations:
    def test_robustness_modes(self):
        path = os.path.join(BENCH, "FMR_ABLATIONS.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/fmr_ablations.py")
        with open(path) as f:
            d = json.load(f)
        clean = d["modes"]["clean"]["mean_dm"]
        noise = d["modes"]["noise"]["mean_dm"]
        density = d["modes"]["density"]["mean_dm"]
        assert np.isfinite([clean, noise, density]).all()
        assert clean < 0.1
        # the reference's robustness story: 0.01 noise barely moves dm,
        # halved density degrades gracefully (not catastrophically)
        assert noise < 2.0 * clean
        assert density < 5.0 * clean


class TestDCPConvergence:
    def test_losses_and_endpoints(self):
        art = _load("dcp")
        inter = _curve(art, "loss_intersection")
        chamfer = _curve(art, "loss_chamfer")
        # the unsupervised objective and the independent chamfer check both
        # drop (the round-1 RESULTS.md table showed 0.538 -> 0.105 chamfer)
        assert inter[-1] < inter[0], (inter[0], inter[-1])
        assert chamfer[-1] < 0.6 * chamfer[0], (chamfer[0], chamfer[-1])
        f = art["final"]
        for k in ("loss", "loss_intersection", "loss_chamfer", "r_rmse_ab",
                  "t_rmse_ab", "rmse_ab", "mae_ab", "mse_ba"):
            assert np.isfinite(f[k]), k


class TestRPMConvergence:
    def test_losses_and_endpoints(self):
        art = _load("rpm")
        total = _curve(art, "loss")
        assert total[-1] < total[0], (total[0], total[-1])
        f = art["final"]
        assert np.isfinite(f["loss_gt"]) and np.isfinite(f["loss_chamfer"])
        # held-out eval monitors recorded
        assert "test_loss" in f or "loss_gt" in f


class TestLargeN:
    """benchmarks/LARGE_N.json (bench_large_n.py): the 16,384-pt end-to-end
    regime (BASELINE config 5) as a committed artifact, not prose."""

    def _art(self):
        path = os.path.join(BENCH, "LARGE_N.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/bench_large_n.py")
        with open(path) as f:
            return json.load(f)

    def test_scale_and_convergence(self):
        art = self._art()
        assert art["n_points"] == 16384 and art["n_lines"] == 20000
        # the known synthetic ground truth is recovered
        assert art["final_rot_err_deg"] < 1.0, art["final_rot_err_deg"]
        assert art["final_trans_err"] < 0.02, art["final_trans_err"]
        # chamfer actually converged (reference-style independent check)
        assert art["chamfer_final"] < 0.05 * art["chamfer_first"]
        assert np.isfinite(art["steps_per_sec"]) and art["steps_per_sec"] > 0

    def test_sp_shard_shapes(self):
        art = self._art()
        sp = art.get("sp_dryrun")
        if sp is None:
            pytest.skip("artifact recorded without the sp dryrun")
        assert sp["mesh"] == {"dp": 1, "sp": 8}
        L = sp["n_lines"]
        # the line axis is genuinely split 8 ways on the virtual mesh
        assert sp["per_device_line_shard_shapes"] == [[1, L // 8, 6]]
        assert all(np.isfinite(sp["losses"]))


class TestRPMVarianceControls:
    """benchmarks/VARIANCE_rpm.json "controls" (round-2 verdict task 2):
    the cross-framework basin-sensitivity controls are committed evidence
    with bars, not prose. Produced by rpm_torch_control.py (the actual
    torch reference harness on our generated dataset, reduced protocol),
    rpm_variance_controls.py (paired JAX streams, identical protocol) and
    train_convergence.py --pretrain_epochs 10000 (the reference CLI's
    default identity-pretrain budget, Train_RPM.py:349-378)."""

    def _controls(self):
        path = os.path.join(BENCH, "VARIANCE_rpm.json")
        if not os.path.exists(path):
            pytest.skip("run the RPM variance study first")
        with open(path) as f:
            doc = json.load(f)
        if "controls" not in doc:
            pytest.skip("run benchmarks/assemble_variance_controls.py")
        return doc["controls"]

    def test_torch_reference_control_points(self):
        c = self._controls()
        torch_runs = c["torch_reference"]
        assert len(torch_runs) >= 2
        rmses = [r["rot_rmse_deg"] for r in torch_runs]
        assert all(np.isfinite(r) and r > 0 for r in rmses)
        # the committed torch-reference runs themselves exhibit basin
        # flips on held-out pairs (the point of the control)
        assert max(r["per_pair_max_deg"] for r in torch_runs) > 45.0

    def test_paired_jax_streams_within_torch_spread(self):
        c = self._controls()
        jax_rmse = [r["rot_rmse_deg"] for r in c["jax_this_repo"]]
        torch_rmse = [r["rot_rmse_deg"] for r in c["torch_reference"]]
        assert len(jax_rmse) >= 3
        # identical protocol/split: our worst committed stream is no worse
        # than the torch reference's worst committed stream
        assert max(jax_rmse) <= max(torch_rmse), (jax_rmse, torch_rmse)

    def test_full_pretrain_budget_recorded(self):
        c = self._controls()
        fp = c.get("full_pretrain_budget")
        if fp is None:
            pytest.skip("10k-pretrain control not recorded")
        assert np.isfinite(fp["rot_rmse_deg"])
        assert os.path.exists(os.path.join(BENCH, "..",
                                           fp["artifact"]))


class TestDCPPretrainedProtocol:
    """benchmarks/TRAINING_dcp_pretrained.json
    (benchmarks/dcp_pretrained_protocol.py): the reference's ACTUAL DCP
    workflow — supervised-pretrained init, then UNSUPERVISED intersection
    fine-tune at Adam lr 1e-6 (Train_DCP.py:553, 890-893) — run end to end,
    with endpoint bars on the held-out battery."""

    def _art(self):
        path = os.path.join(BENCH, "TRAINING_dcp_pretrained.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/dcp_pretrained_protocol.py")
        with open(path) as f:
            return json.load(f)

    def test_protocol_is_the_references(self):
        art = self._art()
        p = art["protocol"]
        assert p["finetune_lr"] == 1e-6          # Train_DCP.py:553
        assert p["n_lines"] == 15000             # Train_DCP.py:253-255
        assert p["pretrain_epochs"] > 0          # pretrained init exists

    def test_finetune_improves_heldout_endpoints(self):
        """The paper's headline claim at this scale: the unsupervised
        intersection fine-tune improves the supervised init on held-out
        rot/trans errors."""
        art = self._art()
        d = art["deltas"]
        assert d["r_rmse_ab"]["improved"], d["r_rmse_ab"]
        assert d["t_rmse_ab"]["improved"], d["t_rmse_ab"]
        # and the training objective itself went down on held-out pairs
        assert d["loss_intersection"]["improved"], d["loss_intersection"]

    def test_endpoints_are_registration_grade(self):
        art = self._art()
        fin = art["finetuned_eval"]
        assert fin["r_rmse_ab"] < 10.0, fin["r_rmse_ab"]   # degrees
        assert np.isfinite(fin["t_rmse_ab"])
        tr = np.asarray(art["per_epoch"]["loss_intersection"], np.float64)
        tr = tr[np.isfinite(tr)]
        assert tr[-1] < tr[0]          # the fine-tune objective converges


class TestEpochDecomposition:
    """benchmarks/EPOCH_DECOMP.json (benchmarks/epoch_decomposition.py):
    round-3 verdict task 1 — training epochs must be device-bound (wall <=
    1.5x device compute) under the scanned device-resident epoch path."""

    def _art(self):
        path = os.path.join(BENCH, "EPOCH_DECOMP.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/epoch_decomposition.py")
        with open(path) as f:
            return json.load(f)

    def test_epochs_device_bound(self):
        art = self._art()
        assert art["harnesses"], "no harnesses recorded"
        for name, rec in art["harnesses"].items():
            assert rec["wall_over_device"] <= 1.5, (name, rec)

    def test_reference_scale_config(self):
        art = self._art()
        assert art["config"]["batch"] == 4
        assert art["config"]["n_points"] == 1024


class TestMemoryNorthStar:
    """benchmarks/MEMORY.json (benchmarks/bench_memory.py): the BASELINE.md
    memory target measured — the fused Pallas metric materializes no
    O(L*F) HBM tensor (vs the reference's >=15 GB requirement,
    /root/reference/README.md:8). Numbers are XLA memory_analysis() of the
    compiled fwd+grad programs, all of which also executed with identical
    losses."""

    def _art(self):
        path = os.path.join(BENCH, "MEMORY.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/bench_memory.py")
        with open(path) as f:
            return json.load(f)

    def _by(self, art, f_points, backend):
        for c in art["cases"]:
            if c["f_points"] == f_points and c["backend"] == backend:
                return c
        pytest.skip(f"case ({f_points}, {backend}) not recorded")

    def test_pallas_peak_is_o_l_plus_f(self):
        art = self._art()
        p5 = self._by(art, 5000, "pallas")
        p16 = self._by(art, 16384, "pallas")
        # flat in F (slot records are O(L); inputs O(F)) and tiny in absolute
        # terms — far below any O(L*F) materialization (20k x 5k floats
        # alone would be 400 MB)
        assert p5["total_bytes"] < 64 * 2**20, p5
        assert p16["total_bytes"] < 64 * 2**20, p16
        assert p16["temp_bytes"] < 2 * p5["temp_bytes"], (p5, p16)

    def test_pallas_vs_dense_ratio(self):
        art = self._art()
        for f in (5000, 16384):
            dense = self._by(art, f, "xla")
            pal = self._by(art, f, "pallas")
            assert dense["total_bytes"] > 100 * pal["total_bytes"], (f, dense)
            # same loss from every backend (the measurement is honest)
            np.testing.assert_allclose(pal["loss"], dense["loss"],
                                       rtol=1e-4)


class TestScalingCurve:
    """benchmarks/SCALING_CURVE.json (benchmarks/bench_points_curve.py):
    round-3 verdict task 7 — the pts-vs-throughput curve tying the 2048-pt
    single-pair headline (bench.py) to the 16,384-pt LARGE_N endpoint, plus
    the batched multi-pair mode recorded AT the true-2048 configuration."""

    def _art(self):
        path = os.path.join(BENCH, "SCALING_CURVE.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/bench_points_curve.py")
        with open(path) as f:
            return json.load(f)

    def test_curve_spans_both_endpoints(self):
        art = self._art()
        pts = [c["n_points"] for c in art["curve"]]
        assert 2048 in pts and 16384 in pts, pts
        assert art["n_lines"] == 20000

    def test_throughput_bars(self):
        art = self._art()
        by = {c["n_points"]: c for c in art["curve"]}
        # headline config: >=10x the reference's ~3.5 it/s with margin
        # (bench.py records ~345 it/s; scanned blocks here are the same path)
        assert by[2048]["iters_per_sec"] >= 200, by[2048]
        # LARGE_N endpoint recorded 112 steps/s at 16,384 pts
        assert by[16384]["iters_per_sec"] >= 60, by[16384]
        # throughput decreases monotonically in F (sanity of the curve)
        ips = [c["iters_per_sec"] for c in sorted(art["curve"],
                                                  key=lambda c: c["n_points"])]
        assert all(a >= b for a, b in zip(ips, ips[1:])), ips

    def test_batched_2048_mode(self):
        art = self._art()
        by = {c["batch"]: c for c in art["batched_2048"]}
        assert set(by) >= {4, 8}, by
        single = {c["n_points"]: c for c in art["curve"]}[2048]
        # batching pairs must raise aggregate pair-throughput over B=1
        assert by[8]["pair_iters_per_sec"] > single["iters_per_sec"], (
            by[8], single)


class TestTrainStepDecomposition:
    """benchmarks/TRAIN_STEP_DECOMP.json (benchmarks/bench_train_steps.py
    --decompose): round-3 verdict tasks 3/4 — per-op decomposition of the
    three unsupervised training steps at reference scale (B=4, 1024 pts),
    with the RPM ball query on the order-equivalent top_k path."""

    BARS_MS = {"dcp": 40.0, "rpm": 65.0, "fmr": 40.0}  # ~1.5x measured

    def _art(self):
        path = os.path.join(BENCH, "TRAIN_STEP_DECOMP.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/bench_train_steps.py --decompose")
        with open(path) as f:
            return json.load(f)

    def test_all_harnesses_recorded(self):
        art = self._art()
        assert set(art) >= {"dcp", "rpm", "fmr"}, set(art)
        for name, rec in art.items():
            assert rec["batch"] == 4 and rec["n_points"] == 1024, rec
            assert rec["ms_per_step"] <= self.BARS_MS[name], (name, rec)

    def test_decomposition_attributes_the_step(self):
        art = self._art()
        for name, rec in art.items():
            d = rec["decomposition"]
            for k in ("model_fwd_ms", "lines_ms", "metric_fwd_ms",
                      "metric_fwdbwd_ms"):
                assert k in d and d[k] > 0, (name, k, d)
            # pieces overlap (the step recomputes the fwd), so their sum
            # bounds the step from above, not below; each piece alone must
            # fit inside the step budget
            assert d["model_fwd_ms"] <= rec["ms_per_step"] * 1.25, (name, d)

    def test_rpm_group_path_recorded(self):
        art = self._art()
        d = art["rpm"]["decomposition"]
        # the round-3 suspect: feature-pyramid grouping (ball query) after
        # the top_k replacement must be a minor share of the step
        assert d["rpm_group_fwd_ms"] <= art["rpm"]["ms_per_step"] * 0.5, d


class TestMixedPrecisionArtifact:
    """benchmarks/MIXED_PRECISION.json (benchmarks/mixed_precision.py):
    the opt-in bf16 mode must actually be faster where the MXU matmuls
    are, and the from-the-same-init convergence runs must track."""

    def _art(self):
        path = os.path.join(BENCH, "MIXED_PRECISION.json")
        if not os.path.exists(path):
            pytest.skip("run benchmarks/mixed_precision.py")
        with open(path) as f:
            return json.load(f)

    def test_speedups(self):
        art = self._art()
        steps = art["steps"]
        assert steps["dcp"]["speedup_x"] >= 1.1, steps["dcp"]
        assert steps["rpm"]["speedup_x"] >= 1.1, steps["rpm"]
        # FMR is metric-bound; bf16 must at least not regress it
        assert steps["fmr"]["speedup_x"] >= 0.95, steps["fmr"]

    def test_convergence_tracks(self):
        art = self._art()
        # round-5: all three harnesses carry convergence runs (round-4
        # artifact had DCP only)
        for name in ("dcp", "rpm", "fmr"):
            conv = art["convergence"].get(name)
            if conv is None:
                assert name != "dcp", art["convergence"]
                pytest.skip(f"{name} convergence not recorded in artifact")
            # same init, same data order: final train loss within 15% and
            # both runs actually went downhill
            assert conv["final_train_rel_diff"] <= 0.15, (name, conv)
            for dt in ("float32", "bfloat16"):
                rec = conv[dt]
                assert rec["train_loss_last5_mean"] < rec["train_loss_first"], (
                    name, rec)
            # held-out bar (advisor r4): bf16 must not wreck generalization —
            # rot RMSE within 1.3x of fp32 (committed DCP run: 3.37 vs 3.06
            # = 1.10x; train-loss tracking alone would miss a held-out
            # regression)
            ratio = conv.get("rot_rmse_ratio_bf16_over_fp32")
            if ratio is not None:
                assert ratio <= 1.3, (name, conv)
