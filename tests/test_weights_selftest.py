"""Converter round-trip selftest (slow tier: three full-backbone checksum
passes). The no-asset rehearsal of the real-weights validation procedure in
docs/REAL_ASSETS.md — random-init params exported to BOTH checkpoint formats,
reloaded through BOTH converters (``models/weights.py``, SURVEY.md's
"highest silent-wrongness risk"), and asserted checksum-identical. The same
code path a real ``--weights`` run takes, so a layout/folding regression is
caught before any real checkpoint exists in the environment."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


def test_weights_smoke_selftest():
    import weights_smoke

    sums = weights_smoke.selftest(seed=0)
    assert "backbone_c4" in sums and "cls_logits" in sums
