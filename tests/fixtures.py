"""Synthetic iCWT-format dataset fixture (re-export).

The factory lives in the package (``data/datasets/synthetic.py``) so the
multi-chip dryrun and demos can fabricate hermetic datasets too; tests keep
importing it from here.
"""

from online_detection_tpu.data.datasets.synthetic import (  # noqa: F401
    _write_xml,
    make_synthetic_icwt,
)
