"""Pins for the contrast-repair harness (scripts/tpu_contrast_repair.py).

The harness auto-targets the contrast where the stable 4-view regime dies
(VERDICT r3 item 2 follow-up): these tests pin the failure criterion, the
highest-contrast-failing-arm selection, and the per-arm arg construction
(traced hull-L1 weights, full-run window schedules, variance-weight gain)
so a refactor can't silently change which arm a TPU campaign runs.
"""
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"),
)

import tpu_contrast_repair as rep  # noqa: E402


def _row(lca, corr, drop):
    return {
        "synth_lca_val": lca,
        "stability": {"final_dyn_corr": corr, "psnr_drop_peak_to_final": drop},
    }


def test_arm_ok_criterion():
    assert rep.arm_ok(_row("2.4", 0.98, 3.1))
    assert not rep.arm_ok(_row("0.8", 0.55, 2.0))   # corr below 0.7
    assert not rep.arm_ok(_row("0.8", 0.9, 9.0))    # collapse > 4 dB
    assert not rep.arm_ok({"synth_lca_val": "0.8", "stability": {}})  # no eval


def test_pick_target_lowest_failing_contrast():
    """Round-4 targeted the HIGHEST failing contrast by mistake (VERDICT r4
    weak #2); the repair campaign must attack the decisive XCAT-like
    lowest-contrast point instead."""
    rows = [
        _row("2.4", 0.98, 3.1),
        _row("1.2", 0.95, 2.0),
        _row("0.8", 0.55, 2.0),
        _row("0.35", 0.2, 9.0),
    ]
    assert rep.pick_target(rows) == "0.35"


def test_pick_target_all_stable_exits_zero():
    with pytest.raises(SystemExit) as e:
        rep.pick_target([_row("2.4", 0.98, 3.1)])
    assert e.value.code == 0


def test_repair_args_apply_levers():
    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["hl1"]))
    assert a.hull_static_l1_weight_start == pytest.approx(1e-8)
    assert a.hull_static_l1_weight_end == pytest.approx(1e-4)
    assert a.static_pos_enc_window_decay_steps == 4500  # recipe default 75%

    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["longwin"]))
    assert a.static_pos_enc_window_decay_steps == 6000
    assert a.temp_pos_enc_window_decay_steps == 6000
    assert a.hull_static_l1_weight_end == 0.0

    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["varmax"]))
    assert a.weighted_loss_max == pytest.approx(3.0)

    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["hl1_longwin"]))
    assert a.hull_static_l1_weight_end == pytest.approx(1e-4)
    assert a.static_pos_enc_window_decay_steps == 6000

    # wincap: permanent STATIC frequency cap; dynamic keeps full schedule
    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["wincap"]))
    assert a.static_pos_enc_window_max == pytest.approx(6.0)
    assert a.temp_pos_enc_window_max == pytest.approx(0.0)
    a = rep.repair_args(6000, "0.8", dict(rep.REPAIRS["wincap_hl1"]))
    assert a.static_pos_enc_window_max == pytest.approx(6.0)
    assert a.hull_static_l1_weight_end == pytest.approx(1e-4)
    # every arm trains on the target-contrast dataset
    assert a.data_name == "SYNTH-FOVC0p8"
    assert a.synth_lca_val == pytest.approx(0.8)


def test_repair_specs_not_mutated_by_arg_build():
    before = {k: dict(v) for k, v in rep.REPAIRS.items()}
    for name in rep.REPAIRS:
        rep.repair_args(6000, "0.5", dict(rep.REPAIRS[name]))
    assert rep.REPAIRS == before
