"""Expansion-math and architecture-plan tests.

Oracles: channel plans / block counts derived at reference model.py:40-76 +
utils.py:7-40 and cross-checked against the committed Keras summaries
(models/*/X3D_*.txt) — see SURVEY.md §3.4.
"""

import pytest

from x3d_tpu import variant_config
from x3d_tpu.models import build_arch
from x3d_tpu.utils import round_repeats, round_width


def test_round_width_identity():
    assert round_width(24, 1.0) == 24
    assert round_width(48, 1.0) == 48
    assert round_width(96, 1.0) == 96
    assert round_width(192, 1.0) == 192


def test_round_width_doubling():
    assert round_width(12, 2) == 24
    assert round_width(24, 2) == 48
    assert round_width(24, 4) == 96
    assert round_width(24, 8) == 192


def test_round_width_xl():
    # XL plan: WIDTH_FACTOR 2.9 applied to the base-12 plan (SCALE_RES2)
    assert round_width(12, 2.9) == 32
    assert round_width(24, 2.9) == 72
    assert round_width(48, 2.9) == 136
    assert round_width(96, 2.9) == 280


def test_round_width_se():
    # SE hidden widths at ratio 0.0625
    assert round_width(54, 0.0625) == 8
    assert round_width(108, 0.0625) == 8
    assert round_width(216, 0.0625) == 16
    # 432*0.0625 = 27 rounds down to 24 < 0.9*27, so the divisor is added
    assert round_width(432, 0.0625) == 32


def test_round_repeats():
    assert [round_repeats(d, 2.2) for d in (1, 2, 5, 3)] == [3, 5, 11, 7]
    assert [round_repeats(d, 5.0) for d in (1, 2, 5, 3)] == [5, 10, 25, 15]


@pytest.mark.parametrize("name", ["XS", "S", "M"])
def test_arch_plan_xs_s_m(name):
    arch = build_arch(variant_config(name))
    assert arch.conv1_dim == 24
    assert [len(s) for s in arch.stages] == [3, 5, 11, 7]
    assert [s[0].out_channels for s in arch.stages] == [24, 48, 96, 192]
    assert [s[0].inner_channels for s in arch.stages] == [54, 108, 216, 432]
    assert arch.conv5_dim == 432


def test_arch_plan_l():
    arch = build_arch(variant_config("L"))
    assert arch.conv1_dim == 24
    assert [len(s) for s in arch.stages] == [5, 10, 25, 15]
    assert [s[0].out_channels for s in arch.stages] == [24, 48, 96, 192]


def test_arch_plan_xl():
    arch = build_arch(variant_config("XL"))
    assert arch.conv1_dim == 32
    assert [len(s) for s in arch.stages] == [5, 10, 25, 15]
    assert [s[0].out_channels for s in arch.stages] == [32, 72, 136, 280]
    assert [s[0].inner_channels for s in arch.stages] == [72, 162, 306, 630]
    assert arch.conv5_dim == 630


def test_se_placement_global_even_indices():
    """SE lands on even 0-based *global* block indices (SURVEY.md Q1)."""
    arch = build_arch(variant_config("M"))
    flat = [b for stage in arch.stages for b in stage]
    for i, b in enumerate(flat):
        assert b.use_se == (i % 2 == 0), f"block {i}"


def test_stride_pattern():
    arch = build_arch(variant_config("M"))
    for stage in arch.stages:
        assert stage[0].stride == 2
        assert all(b.stride == 1 for b in stage[1:])
