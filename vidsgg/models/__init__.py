"""Relation models: TEMPURA (STTran + GMM heads + memory debiasing) and
TEAT-GT (TokenGT graph transformer with temporal-consistency regularizer),
plus the shared object classifier (OSPU)."""

from vidsgg.models.gmm_head import GMMHead  # noqa: F401
from vidsgg.models.sttran import STTran  # noqa: F401
from vidsgg.models.tempura import Tempura, TempuraConfig  # noqa: F401
