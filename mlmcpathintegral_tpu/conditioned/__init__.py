from mlmcpathintegral_tpu.conditioned.base import ConditionedFineAction
from mlmcpathintegral_tpu.conditioned.qm import (
    GaussianConditionedFineAction, RotorConditionedFineAction,
    make_conditioned_fine_action,
)
from mlmcpathintegral_tpu.conditioned.gff import GFFConditionedFineAction
from mlmcpathintegral_tpu.conditioned.schwinger import (
    QuenchedSchwingerConditionedFineAction,
    QuenchedSchwingerGaussianConditionedFineAction,
    QuenchedSchwingerSemiConditionedFineAction,
    make_schwinger_conditioned_fine_action,
)
from mlmcpathintegral_tpu.conditioned.sigma import (
    NonlinearSigmaConditionedFineAction,
)
