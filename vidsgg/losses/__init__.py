"""Loss functions: masked relation CE/BCE, object CE, contrastive losses,
and the TEAT-GT temporal-consistency regularizers."""

from vidsgg.losses.relation import (  # noqa: F401
    masked_bce,
    masked_ce,
)
from vidsgg.losses.contrastive import (  # noqa: F401
    contrastive_loss,
    euc_norm_loss,
    supcon_loss,
)
