from mlmcpathintegral_tpu.samplers.base import Sampler
from mlmcpathintegral_tpu.samplers.hmc import HMCSampler, HMCState
from mlmcpathintegral_tpu.samplers.heatbath import OverrelaxedHeatBathSampler
from mlmcpathintegral_tpu.samplers.cluster import ClusterSampler
from mlmcpathintegral_tpu.samplers.cluster2d import Cluster2DSampler
from mlmcpathintegral_tpu.samplers.exact import ExactSampler
from mlmcpathintegral_tpu.samplers.hierarchical import HierarchicalSampler
from mlmcpathintegral_tpu.samplers.multilevel import MultilevelSampler
from mlmcpathintegral_tpu.samplers.schwingercluster import (
    QuenchedSchwingerClusterSampler,
)
