"""Public module facades (the reference's L2 API surface, SURVEY.md §1)."""

from online_detection_tpu.modules.abstract import (  # noqa: F401
    AccuracyEvaluatorAbstract,
    ClassifierAbstract,
    FeatureExtractorAbstract,
    RegionClassifierAbstract,
    RegionRefinerAbstract,
)
from online_detection_tpu.modules.facades import (  # noqa: F401
    FALKONWrapper,
    OnlineRegionClassifier,
    RegionRefiner,
)
from online_detection_tpu.modules.feature_extractor import (  # noqa: F401
    AccuracyEvaluator,
    FeatureExtractor,
)
from online_detection_tpu.modules.demo import (  # noqa: F401
    IncrementalTeacher,
    OnlineSegmentationDemo,
)

# The reference ships a second "InCore" variant of the classifier stack whose
# only difference is keeping every tensor GPU-resident
# (``OnlineRegionClassifier_incore.py``, ``FALKONWrapper_..._incore.py``).
# Device-resident is this framework's DEFAULT, so the InCore names are
# aliases.
OnlineRegionClassifierIncore = OnlineRegionClassifier
FALKONWrapperIncore = FALKONWrapper
