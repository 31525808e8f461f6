from mlmcpathintegral_tpu.conditioned.base import ConditionedFineAction
from mlmcpathintegral_tpu.conditioned.qm import (
    GaussianConditionedFineAction, RotorConditionedFineAction,
    make_conditioned_fine_action,
)
