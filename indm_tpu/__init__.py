"""INDM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for Implicit
Nonlinear Diffusion Models (INDM, NeurIPS 2022).

A from-scratch rebuild of the capabilities of the PyTorch/CUDA reference
(byeonghu-na/INDM): score-based diffusion (VP/subVP/VE/GeometricVP SDEs)
trained jointly with a normalizing flow (resflow / wolf VAE-flow), PC/ODE
samplers, probability-flow-ODE likelihood, FID/IS/KID evaluation — all
designed TPU-first: NHWC layouts, pure-functional state pytrees, one jitted
train step sharded over a `jax.sharding.Mesh`, `lax.scan`/`while_loop`
control flow, and Pallas kernels for the ops the reference implemented in
CUDA (`op/upfirdn2d_kernel.cu`, `op/fused_bias_act_kernel.cu`).
"""

__version__ = "0.1.0"
