from mlmcpathintegral_tpu.parallel.chains import (
    chain_mesh, shard_chains, distribute_n,
)
