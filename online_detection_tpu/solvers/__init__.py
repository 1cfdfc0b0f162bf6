"""On-line solvers: FALKON (Nystrom KRR via PCG), RLS refiners, minibootstrap."""

from online_detection_tpu.solvers.falkon import (  # noqa: F401
    FalkonModel, falkon_fit, falkon_fit_classes, falkon_predict,
    falkon_predict_classes, select_nystrom_centers,
)
from online_detection_tpu.solvers.minibootstrap import (  # noqa: F401
    MinibootstrapParams, train_classifiers_minibootstrap,
)
from online_detection_tpu.solvers.rls import (  # noqa: F401
    RLSModel, rls_fit, rls_fit_grouped, rls_predict,
)
