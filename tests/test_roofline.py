"""The roofline ledger (mazu_tpu/roofline.py <-> docs/ROOFLINE.md) must
stay consistent: the gather-cost model has to predict every measured tier
within 35%, or either an engine regressed or the constants are stale."""

from mazu_tpu import roofline


def test_model_predicts_measured_tiers():
    for t in roofline.TIERS:
        if t.measured_mqs is None:
            continue
        pred = t.predicted_mqs()
        ratio = pred / t.measured_mqs
        assert 0.65 < ratio < 1.55, (t.name, pred, t.measured_mqs)


def test_report_renders():
    r = roofline.report()
    assert "XLA gather wall" in r and "speed of light" in r.lower()
    for t in roofline.TIERS:
        assert t.name in r


def test_speed_of_light_headroom():
    # the documented 10-50x DMA headroom claim over the XLA wall
    sol = roofline.speed_of_light_rows_per_s(efficiency=0.25)
    xla = 1e9 / roofline.ROW_GATHER_NS
    assert 10 < sol / xla < 100
