from mlmcpathintegral_tpu.samplers.base import Sampler
from mlmcpathintegral_tpu.samplers.hmc import HMCSampler, HMCState
