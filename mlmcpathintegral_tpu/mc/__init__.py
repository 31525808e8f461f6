from mlmcpathintegral_tpu.mc.singlelevel import MonteCarloSingleLevel
from mlmcpathintegral_tpu.mc.twolevelstep import (
    TwoLevelMetropolisStep, TwoLevelState,
)
from mlmcpathintegral_tpu.mc.twolevel import MonteCarloTwoLevel
from mlmcpathintegral_tpu.mc.multilevel import MonteCarloMultiLevel
