"""Evaluation: scene-graph Recall/meanRecall and the temporal-consistency
score. Host-side NumPy, bit-exact to the reference's metric semantics
(tools/utils/evaluation_recall.py, tools/utils/temporal_consistency.py)."""

from vidsgg.eval.evaluator import (  # noqa: F401
    SceneGraphEvaluator,
    get_ag_evaluators,
)
from vidsgg.eval.temporal import (  # noqa: F401
    evaluate_temporal_consistency,
    temporal_consistency_summary,
)
