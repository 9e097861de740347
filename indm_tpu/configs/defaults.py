"""Default ConfigDicts, field-compatible with the reference configs.

Mirrors `/root/reference/configs/default_cifar10_configs.py:5-133` and
`default_celeba_configs.py` so that every `config.a.b` knob used by the
reference experiments resolves to the same name here. Torch-specific leaves
(`config.device`) are dropped; JAX-specific leaves are added under their own
names and documented.
"""

import ml_collections


def get_default_configs(dataset: str = "CIFAR10") -> ml_collections.ConfigDict:
  config = ml_collections.ConfigDict()

  # training
  config.training = training = ml_collections.ConfigDict()
  config.training.batch_size = 128
  training.n_iters = 13000001
  training.snapshot_freq = 10000
  training.log_freq = 100
  training.eval_freq = 100
  training.snapshot_freq_for_preemption = 10000
  training.snapshot_sampling = True
  training.likelihood_weighting = True
  training.continuous = True
  training.reduce_mean = False
  training.importance_sampling = True
  training.unbounded_parametrization = False
  training.ddpm_score = True
  training.st = False
  training.k = 1.2
  training.truncation_time = 1e-5
  training.num_train_data = 50000
  training.reconstruction_loss = False
  training.stabilizing_constant = 0.0

  # sampling
  config.sampling = sampling = ml_collections.ConfigDict()
  sampling.n_steps_each = 1
  sampling.noise_removal = True
  sampling.probability_flow = False
  sampling.snr = 0.16 if dataset == "CIFAR10" else 0.15
  sampling.batch_size = 1024
  sampling.truncation_time = 1e-5
  sampling.temperature = 1.0
  sampling.need_sample = True
  sampling.idx_rand = True
  sampling.pc_denoise = False
  sampling.pc_denoise_time = 0.0
  sampling.more_step = False
  sampling.num_scales = 1000
  sampling.pc_ratio = 1.0
  sampling.begin_snr = 0.16
  sampling.end_snr = 0.16
  sampling.snr_scheduling = "none"

  # evaluation
  config.eval = evaluate = ml_collections.ConfigDict()
  evaluate.begin_ckpt = 9 if dataset == "CIFAR10" else 1
  evaluate.end_ckpt = 26
  evaluate.batch_size = 200
  evaluate.enable_sampling = True
  evaluate.num_samples = 50000
  evaluate.enable_loss = True
  evaluate.enable_bpd = True
  evaluate.bpd_dataset = "test"
  evaluate.num_test_data = 10000 if dataset == "CIFAR10" else 19962
  evaluate.residual = False
  evaluate.score_ema = True
  evaluate.flow_ema = False
  evaluate.num_nelbo = 3
  evaluate.rtol = 1e-5
  evaluate.atol = 1e-5
  evaluate.gap_diff = False
  evaluate.target_ckpt = -1
  evaluate.truncation_time = -1.0
  evaluate.data_mean = False
  evaluate.skip_nll_wrong = False

  # data
  config.data = data = ml_collections.ConfigDict()
  data.dataset = dataset
  data.image_size = 32 if dataset == "CIFAR10" else 64
  data.random_flip = True
  data.centered = False
  data.num_channels = 3

  # model
  config.model = model = ml_collections.ConfigDict()
  # TPU mixed precision for the score net: convs/attention compute in bf16
  # (f32 master params, f32 GroupNorm stats/output). Reference-faithful
  # default is pure f32; bench.py enables this for the TPU-first headline.
  model.mixed_precision = False
  # Fused GroupNorm(+swish) Pallas kernel pair for the score nets
  # (indm_tpu/ops/group_norm_pallas.py): one HBM read+write per norm+act
  # instead of XLA's multi-pass fusions. Off by default: on the CIFAR-10
  # NCSN++ geometry XLA's own fusions measure ~5% FASTER end-to-end
  # (PERF.md round-4 negative result); the knob stays for geometries where
  # GroupNorm is isolated from fusable neighbors.
  model.fused_groupnorm = False
  # Dropout masks from XLA's hardware rng-bit-generator instead of
  # threefry (models/layers.py:Dropout). Off by default: threefry masks
  # are bit-stable across shardings; rbg is ~an order of magnitude
  # cheaper on TPU (bench.py enables it for the TPU-first headline).
  model.fast_dropout = False
  model.sigma_min = 0.01
  model.sigma_max = 50 if dataset == "CIFAR10" else 90.0
  model.num_scales = 1000
  model.beta_min = 0.1
  model.beta_max = 20.0
  model.dropout = 0.1
  model.embedding_type = "fourier"
  model.auxiliary_resblock = True
  model.attention = True
  model.fourier_feature = False

  # optimization
  config.optim = optim = ml_collections.ConfigDict()
  optim.optimizer = "AdamW"
  optim.weight_decay = 0.01
  optim.lr = 2e-4
  optim.beta1 = 0.9
  optim.eps = 1e-8
  optim.warmup = 0
  optim.grad_clip = 1.0
  optim.num_micro_batch = 1
  optim.reset = True
  optim.amsgrad = False

  # flow
  config.flow = flow = ml_collections.ConfigDict()
  flow.model = "identity"
  flow.lr = 1e-3
  flow.ema_rate = 0.999
  flow.optim_reset = False
  flow.nblocks = "16-16"
  flow.intermediate_dim = 512
  flow.resblock_type = "resflow"
  flow.squeeze = dataset != "CIFAR10"
  flow.actnorm = False
  flow.grad_in_forward = False
  flow.act_fn = "sin"
  # JAX-specific: >0 replaces the dynamic-length Neumann while_loop with a
  # fixed unroll of this many VJP terms (compile-friendlier; tiny clipped-
  # tail bias). 0 = exact dynamic loop (reference semantics).
  flow.logdet_unroll = 0
  # bf16 stop-gradient Neumann chain (estimator-only; gradients stay f32)
  flow.logdet_bf16 = False
  # bf16 compute in the Lipschitz nets (f32 master params + f32 weight
  # normalization; convs at MXU bf16 rate)
  flow.mixed_precision = False
  # fused Pallas Neumann chain: all sampled J^T v terms execute in ONE
  # kernel with weights + activation derivatives resident in VMEM
  # (indm_tpu/ops/neumann_pallas.py); numerics-identical estimator, big
  # HBM-traffic cut on TPU. Auto-falls back for unsupported net shapes.
  flow.logdet_pallas = False
  # remat policy: also save the Lipschitz-net pre-activations so the
  # backward skips the sin-heavy forward recompute (~2 GB extra HBM at the
  # flagship geometry; off = reference remat behavior)
  flow.remat_save_preacts = False
  # custom-VJP fused iResBlock kernel pair (indm_tpu/ops/fused_block.py):
  # forward + Neumann chain + J^T u in ONE kernel (each sin/cos evaluated
  # once), complete backward (incl. second-order logdet terms) in a second
  # in-VMEM-recompute kernel; scan remat becomes unnecessary. Supported
  # for the 3-1-3 sin Lop geometry; auto-falls back otherwise.
  flow.fused_block = False

  config.seed = 42
  config.datadir = "."
  config.checkpoint_meta_dir = "."
  config.resume = False

  # JAX/TPU-specific additions (not in the reference).
  config.jax = jax_cfg = ml_collections.ConfigDict()
  jax_cfg.dtype = "float32"          # compute dtype for the score network
  jax_cfg.data_axis = "data"         # mesh axis name for data parallelism
  jax_cfg.donate_state = True        # donate state buffers into train step
  jax_cfg.profile_dir = ""           # capture a jax.profiler trace of steps
  jax_cfg.profile_steps = (10, 15)   # [begin, end) when profile_dir is set

  return config


def _common_indm_flow(flow, dataset: str):
  """Flow settings shared by all shipped INDM experiments
  (`configs/vp/CIFAR10/indm_nll.py:66-103`)."""
  flow.model = "wolf"
  flow.lr = 1e-3
  flow.ema_rate = 0.999
  flow.optim_reset = False
  flow.nblocks = "16-16"
  flow.intermediate_dim = 512
  flow.resblock_type = "resflow"
  if dataset == "CIFAR10":
    flow.model_config = (
        "flow_models/wolf/wolf_configs/cifar10/glow/resflow-gaussian-uni.json")
  else:
    flow.model_config = ("flow_models/wolf/wolf_configs/imagenet/64x64/glow/"
                         "resflow-gaussian-uni.json")
  flow.rank = 1
  flow.local_rank = 0
  flow.batch_size = 512
  flow.eval_batch_size = 4
  flow.batch_steps = 1
  flow.init_batch_size = 1024
  flow.epochs = 500
  flow.valid_epochs = 1
  flow.seed = 65537
  flow.train_k = 1
  flow.log_interval = 10
  flow.warmup_steps = 500
  flow.lr_decay = 0.999997
  flow.beta1 = 0.9
  flow.beta2 = 0.999
  flow.eps = 1e-8
  flow.weight_decay = 0
  flow.amsgrad = True
  flow.grad_clip = 0
  flow.dataset = "cifar10" if dataset == "CIFAR10" else "celeba"
  flow.category = None
  flow.image_size = 32 if dataset == "CIFAR10" else 64
  flow.workers = 4
  flow.n_bits = 8
  flow.recover = -1


def _vp_model(model):
  """NCSN++ geometry for VP (`configs/vp/CIFAR10/indm_nll.py:41-64`)."""
  model.name = "ncsnpp"
  model.scale_by_sigma = False
  model.ema_rate = 0.9999
  model.normalization = "GroupNorm"
  model.nonlinearity = "swish"
  model.nf = 128
  model.ch_mult = (1, 2, 2, 2)
  model.num_res_blocks = 4
  model.attn_resolutions = (16,)
  model.resamp_with_conv = True
  model.conditional = True
  model.fir = False
  model.fir_kernel = [1, 3, 3, 1]
  model.skip_rescale = True
  model.resblock_type = "biggan"
  model.progressive = "none"
  model.progressive_input = "none"
  model.progressive_combine = "sum"
  model.attention_type = "ddpm"
  model.init_scale = 0.0
  model.embedding_type = "positional"
  model.fourier_scale = 16
  model.conv_size = 3


def _ve_model(model):
  """NCSN++ geometry for VE (`configs/ve/CIFAR10/indm.py:38-61`)."""
  model.name = "ncsnpp"
  model.scale_by_sigma = True
  model.ema_rate = 0.999
  model.normalization = "GroupNorm"
  model.nonlinearity = "swish"
  model.nf = 128
  model.ch_mult = (1, 2, 2, 2)
  model.num_res_blocks = 4
  model.attn_resolutions = (16,)
  model.resamp_with_conv = True
  model.conditional = True
  model.fir = True
  model.fir_kernel = [1, 3, 3, 1]
  model.skip_rescale = True
  model.resblock_type = "biggan"
  model.progressive = "none"
  model.progressive_input = "residual"
  model.progressive_combine = "sum"
  model.attention_type = "ddpm"
  model.init_scale = 0.0
  model.fourier_scale = 16
  model.conv_size = 3


def vp_indm(dataset: str, nll: bool) -> ml_collections.ConfigDict:
  """VP INDM experiment (`configs/vp/{CIFAR10,CELEBA}/indm_{nll,fid}.py`)."""
  config = get_default_configs(dataset)
  config.training.sde = "vpsde"
  config.training.continuous = True
  config.training.reduce_mean = True
  if not nll:
    config.training.likelihood_weighting = False
    config.training.importance_sampling = False
  config.sampling.method = "ode"
  config.sampling.predictor = "euler_maruyama"
  config.sampling.corrector = "none"
  config.data.centered = True
  _vp_model(config.model)
  _common_indm_flow(config.flow, dataset)
  return config


def ve_indm(dataset: str) -> ml_collections.ConfigDict:
  """VE INDM experiment (`configs/ve/{CIFAR10,CELEBA}/indm.py`)."""
  config = get_default_configs(dataset)
  config.training.sde = "vesde"
  config.training.continuous = True
  config.training.likelihood_weighting = True
  config.training.importance_sampling = True
  config.sampling.method = "pc"
  config.sampling.predictor = "reverse_diffusion"
  config.sampling.corrector = "langevin"
  _ve_model(config.model)
  _common_indm_flow(config.flow, dataset)
  return config
