from mlmcpathintegral_tpu.distributions.rejection import batched_rejection_sample
from mlmcpathintegral_tpu.distributions.expsin2 import ExpSin2Distribution
from mlmcpathintegral_tpu.distributions.expcos import ExpCosDistribution
from mlmcpathintegral_tpu.distributions.compactexp import CompactExpDistribution
from mlmcpathintegral_tpu.distributions.besselproduct import (
    BesselProductDistribution,
)
from mlmcpathintegral_tpu.distributions.approxbesselproduct import (
    ApproximateBesselProductDistribution,
)
from mlmcpathintegral_tpu.distributions.gaussianfillin import (
    GaussianFillinDistribution,
)
