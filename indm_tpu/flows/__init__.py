from indm_tpu.flows import resflow
from indm_tpu.flows.resflow import ResidualFlow
