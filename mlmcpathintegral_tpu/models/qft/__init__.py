from mlmcpathintegral_tpu.models.qft.gff import GFFAction
