"""Summary tool golden totals (analog of the reference's committed summaries)."""

import pytest

from x3d_tpu.tools.summary import summarize


@pytest.mark.parametrize("variant,total", [("XS", "3,795,830"),
                                           ("L", "6,212,600"),
                                           ("XL", "11,176,530")])
def test_summary_totals(variant, total):
    text = summarize(variant)
    assert f"Total:                {total}" in text
    assert "conv_1 (stem)" in text and "fc_2" in text
