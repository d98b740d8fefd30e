from .features import build_feature_pipeline, prepare_event_features  # noqa: F401
from .iforest import IsolationForestModel  # noqa: F401
from .lof import LOFNoveltyModel  # noqa: F401
from .reconstruction import ReconstructionScorer  # noqa: F401
from .ensemble import AnomalyEnsemble  # noqa: F401
