"""TPUTrainer — the E2ENet training orchestrator.

Parity: reference nnUNetTrainer_simple (training/network_training/
nnUNetTrainer_simple.py): plans ingestion (:1029-1103), DA setup (:682-733),
DS loss weights (:200-215), generators (:735-754), SGD(1e-2, .99 nesterov,
wd 3e-5) + poly LR (:367-371, :756-771), epoch loop with online foreground
Dice (:929-1020, :373-423), checkpoints named
'{Tconv}_model_{latest,best,final_checkpoint}.model' (:1140-1176), DSFF
mask.step() per iteration with cosine death-rate decay and periodic
truncate_weights (sparselearning/core_channel.py:290-317), matplotlib
progress plot (network_trainer.py:188-223), debug.json field dump
(:886-906).

TPU redesign: the inner loop is one jitted train_step; batches stream from a
background-thread augmentation pipeline; the DSFF update is a jitted pytree
function; metrics live on device until epoch end.
"""
import json
import os
import time
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import AugmentParams, get_patch_size
from ..data.dataset import do_split, load_dataset, unpack_dataset
from ..data.pipeline import BatchPipeline
from ..data.sampler import PatchSampler3D
from ..models.unetpp import (build_network, deep_supervision_scales,
                             ds_loss_weights)
from ..plans import Plans
from ..utils.files import (isfile, join, load_pickle, maybe_mkdir_p,
                           save_json)
from ..utils.logger import RunLogger
from ..utils.registry import TRAINERS
from . import dsff
from .checkpoint import load_checkpoint, save_checkpoint
from .lr import poly_lr
from .train_state import (create_train_state, make_eval_step, make_mask_update_step, make_train_step)


@TRAINERS.register()
class TPUTrainer:
    def __init__(self, plans: Plans, fold, output_folder: str,
                 dataset_directory: Optional[str] = None, stage: int = 0,
                 batch_dice: bool = True, tconv: str = "shiftConvPP",
                 max_num_epochs: int = 200, num_batches_per_epoch: int = 250,
                 num_val_batches_per_epoch: int = 50, unpack_data: bool = True,
                 fp16: bool = True, dsff_config: Optional[dsff.DSFFConfig] = None,
                 seed: int = 0, num_da_threads: int = 1,
                 base_num_features: int = 48, cascade: bool = False,
                 loss_name: str = "dc_ce", momentum: float = 0.99,
                 optimizer: str = "sgd",
                 initial_lr: float = 1e-2, da_level: Optional[str] = None,
                 dummy_load: bool = False,
                 profile_dir: Optional[str] = None,
                 num_devices: Optional[int] = None,
                 spatial_parallel: int = 1,
                 device_augment: bool = False,
                 norm_op: str = "instance", nonlin: str = "lrelu",
                 fused: Optional[bool] = None,
                 remat: Optional[bool] = None,
                 lr_schedule: str = "poly",
                 momentum_schedule: Optional[str] = None,
                 loss_kwargs: Optional[dict] = None,
                 loss_schedule: Optional[str] = None,
                 num_conv_per_stage: Optional[int] = None,
                 seg_bias: bool = False,
                 nonlin_before_norm: bool = False,
                 regions=None, ds_mode: str = "standard",
                 validate_every: Optional[int] = None,
                 export_kwargs: Optional[dict] = None,
                 conv_kernel=None):
        self.plans = plans
        self.fold = fold
        self.stage = stage
        self.tconv = tconv
        self.batch_dice = batch_dice
        self.max_num_epochs = max_num_epochs
        self.num_batches_per_epoch = num_batches_per_epoch
        self.num_val_batches_per_epoch = num_val_batches_per_epoch
        self.unpack_data = unpack_data
        self.fp16 = fp16
        self.dsff_config = dsff_config
        self.seed = seed
        self.num_da_threads = num_da_threads
        self.base_num_features = base_num_features
        self.cascade = cascade
        self.remat = remat
        self.norm_op = norm_op
        self.nonlin = nonlin

        self.output_folder_base = output_folder
        self.output_folder = join(output_folder, f"fold_{fold}")
        maybe_mkdir_p(self.output_folder)
        self.dataset_directory = dataset_directory
        self.gt_niftis_folder = (join(dataset_directory, "gt_segmentations")
                                 if dataset_directory else None)

        self.logger = RunLogger(self.output_folder)
        self.initial_lr = initial_lr
        self.loss_name = loss_name
        self.momentum = momentum
        self.optimizer = optimizer
        self.da_level = da_level
        self.dummy_load = dummy_load
        self.profile_dir = profile_dir
        self.num_devices = num_devices
        self.spatial_parallel = spatial_parallel
        self.fused = fused      # None = auto: Pallas fused blocks on TPU
        self.device_augment = device_augment
        self.oversample_foreground_percent = 0.33
        # variant-zoo knobs (training/lr.py cites the reference trainers):
        # lr_schedule: poly|warmup|fixed|fixed2|cycle|plateau
        # momentum_schedule: None|'reduce'; loss_schedule: None|'ce_to_dice'
        self.lr_schedule = lr_schedule
        self.momentum_schedule = momentum_schedule
        self.loss_kwargs = dict(loss_kwargs) if loss_kwargs else None
        self.loss_schedule = loss_schedule
        self.num_conv_per_stage_override = num_conv_per_stage
        self.seg_bias = seg_bias
        self.nonlin_before_norm = nonlin_before_norm
        # region-based training (BraTS competition trainers): sigmoid
        # heads over label-union regions (training/regions.py)
        self.regions = None
        self.regions_class_order = None
        if regions is not None:
            from .regions import resolve_regions
            self.regions = resolve_regions(regions)
            self.regions_class_order = tuple(
                range(1, len(self.regions) + 1))
        assert ds_mode in ("standard", "none"), ds_mode
        self.ds_mode = ds_mode
        self.validate_every = validate_every
        self.export_kwargs = dict(export_kwargs) if export_kwargs else None
        self.conv_kernel_override = (tuple(conv_kernel) if conv_kernel
                                     else None)
        self.train_loss_MA = None            # network_trainer.py:95-105
        self.train_loss_MA_alpha = 0.93
        self._plateau = None
        if lr_schedule == "plateau":
            from .lr import ReduceLROnPlateau
            self._plateau = ReduceLROnPlateau(initial_lr, factor=0.2,
                                              patience=30, threshold=1e-3)
        if lr_schedule == "warmup":
            # nnUNetTrainerV2_warmup trains 1050 epochs by default; keep
            # the user's max_num_epochs (the schedule only needs >50)
            pass

        self.stage_plan = plans.plans_per_stage[stage]
        self.patch_size = np.array(self.stage_plan.patch_size)
        self.batch_size = int(self.stage_plan.batch_size)
        self.num_classes = plans.num_classes + 1  # incl. background
        self.num_modalities = plans.num_modalities

        self.epoch = 0
        self.all_tr_losses = []
        self.all_val_losses = []
        self.all_val_eval_metrics = []
        self.train_loss_MA = None
        self.best_val_eval_criterion_MA = None
        self.val_eval_criterion_MA = None
        self.val_eval_criterion_alpha = 0.9
        self.save_every = 50   # reference nnUNetTrainer_simple.py:168

        self.was_initialized = False

    # ----------------------------------------------------------- setup
    def initialize(self, training: bool = True):
        if self.was_initialized:
            return
        import jax.numpy as jnp
        num_in = self.num_modalities
        if self.cascade:
            # prev-stage seg arrives as one-hot fg-class channels
            num_in += self.num_classes - 1
        # region-based trainers: one sigmoid head channel per region
        # (nnUNetTrainerV2BraTSRegions.process_plans :78-80)
        self.net_num_classes = (len(self.regions) if self.regions
                                else self.num_classes)
        # fused Pallas blocks by default on TPU (684 ms/step vs 1274 XLA,
        # node remat fits HBM at Heart geometry — PERF_NOTES.md). Quadrant
        # is ON for training since the round-5 measurements: with level-1
        # fusion + the prefetched qfused backward it wins (684 vs 709
        # ms/step plain; round-4's 810-vs-787 loss predates both)
        # remat auto: OFF for the bf16 fused+quadrant production path —
        # the chunked quadrant backward + fused L0-1 shrink the saved set
        # enough that no-remat fits 16G HBM at Heart-scale geometry and is
        # ~10% faster (455 -> 410 ms/step, PERF_NOTES round-5); any other
        # configuration keeps the safe default (remat on)
        remat = self.remat
        if remat is None:
            import jax
            on_tpu = jax.devices()[0].platform != "cpu"
            production = (self.fp16 and on_tpu
                          and (self.fused is None or self.fused))
            remat = not production
        self.network = build_network(
            self.stage_plan, num_in, self.net_num_classes,
            tconv=self.tconv, base_num_features=self.base_num_features,
            compute_dtype=jnp.bfloat16 if self.fp16 else jnp.float32,
            norm_op=self.norm_op, nonlin=self.nonlin, fused=self.fused,
            remat=remat,
            num_conv_per_stage=self.num_conv_per_stage_override,
            seg_bias=self.seg_bias,
            nonlin_before_norm=self.nonlin_before_norm,
            conv_kernel=self.conv_kernel_override)
        self.num_pool = len(self.stage_plan.pool_op_kernel_sizes)
        n_out = self.network.num_ds_outputs()
        self.ds_weights = ds_loss_weights(self.num_pool, n_out)
        self.ds_scales = deep_supervision_scales(
            self.stage_plan.pool_op_kernel_sizes, n_out)
        if self.ds_mode == "none":
            # nnUNetTrainerV2_noDeepSupervision: single full-res head,
            # plain (unwrapped) loss
            self.ds_weights = [1.0]
            self.ds_scales = None

        self.setup_da_params()

        x0 = jnp.zeros((1, *[int(i) for i in self.patch_size], num_in),
                       jnp.float32)
        params = jax.jit(self.network.init)(
            jax.random.PRNGKey(self.seed), x0)["params"]

        masks = None
        self.fired_masks = None
        if self.dsff_config is not None and self.dsff_config.sparse:
            cfg = self.dsff_config
            mode = cfg.sparse_init
            rng1 = jax.random.PRNGKey(self.seed + 1)
            if cfg.granularity == "row":
                assert mode == "uniform", \
                    "row granularity supports sparse_init='uniform'"
                masks = dsff.init_masks_row(params, cfg.density, rng1)
            elif mode in ("uniform", "dense"):
                # kernel-granular engine (core_channel.py)
                masks = dsff.init_masks(params, cfg.density, rng1, mode=mode)
            elif mode in ("uniform_ori", "ERK"):
                # element-granular engine (core.py)
                masks = dsff.init_masks_element(params, cfg.density, rng1,
                                                mode=mode)
            elif mode == "GMP":
                masks = dsff.init_masks_gmp(params)
            elif mode == "lottery_ticket":
                masks = dsff.init_masks_lottery(params, cfg.density)
            else:
                raise ValueError(
                    f"sparse_init '{mode}' not supported from the trainer "
                    "(uniform/dense/uniform_ori/ERK/GMP/lottery_ticket; "
                    "snip and GraSP need a data batch — use "
                    "dsff.init_masks_element / init_masks_grasp directly)")
            if (cfg.prune_mode == "local" and mode != "GMP"
                    and cfg.final_density != cfg.density):
                self.logger.log(
                    "NOTE: final_density has no effect with "
                    "prune_mode='local' (the per-layer engine is density-"
                    "preserving, as in the reference); use "
                    "--prune_mode global for the gradual-density schedule")
            # ITOP fired-mask bookkeeping (core_channel.py:861-876).
            # COPIES: state.masks buffers get donated by the jitted train
            # step — aliasing them here would leave deleted arrays behind.
            self.fired_masks = {k: jnp.array(v, copy=True)
                                for k, v in masks.items()}
            self._regrow_ratio = 1.01   # reference initial (:97)
            self.t_max = self.max_num_epochs * self.num_batches_per_epoch
        self.state = create_train_state(params, masks, seed=self.seed,
                                        optimizer=self.optimizer)

        self.mesh = None
        n_dev = self.num_devices or 1
        if n_dev > 1:
            # multi-device data(+spatial)-parallel training: replaces the
            # reference's DDP/NCCL (nnUNetTrainerV2_DDP.py); gradient psum
            # and the global batch-Dice reduction are inserted by GSPMD
            from ..parallel.mesh import make_mesh, make_sharded_train_step
            assert self.batch_size % (n_dev // self.spatial_parallel) == 0, (
                f"batch {self.batch_size} not divisible by data-parallel "
                f"size {n_dev // self.spatial_parallel}")
            self.mesh = make_mesh(jax.devices()[:n_dev],
                                  spatial_parallel=self.spatial_parallel)
            self.train_step = make_sharded_train_step(
                self.network, self.ds_weights, self.mesh, self.batch_dice,
                loss_name=self.loss_name, momentum=self.momentum,
                optimizer=self.optimizer, loss_kwargs=self.loss_kwargs,
                dynamic_loss_weights=self.loss_schedule == "ce_to_dice",
                dynamic_momentum=self.momentum_schedule == "reduce",
                do_ds=self.ds_mode != "none")
            from ..parallel.mesh import replicate_state
            self.state = replicate_state(self.mesh, self.state)
            self.logger.log(f"multi-device training: mesh={self.mesh.shape}")
        else:
            self.train_step = make_train_step(
                self.network, self.ds_weights, self.batch_dice,
                loss_name=self.loss_name, momentum=self.momentum,
                optimizer=self.optimizer, loss_kwargs=self.loss_kwargs,
                dynamic_loss_weights=self.loss_schedule == "ce_to_dice",
                dynamic_momentum=self.momentum_schedule == "reduce",
                do_ds=self.ds_mode != "none")
        self.eval_step = make_eval_step(
            self.network, self.ds_weights, self.batch_dice,
            loss_name=self.loss_name, loss_kwargs=self.loss_kwargs,
            dynamic_loss_weights=self.loss_schedule == "ce_to_dice",
            do_ds=self.ds_mode != "none",
            regions=self.regions is not None)
        if masks is not None:
            cfg = self.dsff_config
            self.mask_granularity = (
                cfg.granularity if cfg.granularity != "auto"
                else dsff.mask_granularity(masks, params))
            self.mask_update = make_mask_update_step(
                cfg.growth, prune_mode=cfg.prune_mode,
                granularity=self.mask_granularity)
            # the reference reads weight.grad for gradient-based growth
            # (kernel_grad_growth / the global grow phase); we recompute
            # grads on the update step's batch when needed
            self._dsff_grad_step = None
            if cfg.growth == "gradient" or cfg.prune_mode == "global":
                from .train_state import make_grad_step
                self._dsff_grad_step = make_grad_step(
                    self.network, self.ds_weights, self.batch_dice,
                    loss_name=self.loss_name)

        if self.device_augment:
            from ..ops.device_augment import make_device_augmenter
            self._aug_key = jax.random.PRNGKey(self.seed + 7)
            self.device_aug = make_device_augmenter(
                tuple(int(i) for i in self.patch_size),
                tuple(int(i) for i in self.basic_generator_patch_size),
                self.num_classes, self.ds_scales,
                do_mirror=self.da_params.do_mirror,
                do_rotation=self.da_params.do_rotation,
                do_scaling=self.da_params.do_scaling,
                do_gamma=self.da_params.do_gamma)

        if training:
            self._setup_generators()
        self.was_initialized = True
        self.logger.log(f"initialized TPUTrainer Tconv={self.tconv} "
                        f"patch={list(self.patch_size)} "
                        f"batch={self.batch_size} classes={self.num_classes}")

    def setup_da_params(self):
        rot = (-30.0 / 360 * 2 * np.pi, 30.0 / 360 * 2 * np.pi)
        do_dummy_2d = bool(self.stage_plan.do_dummy_2D_data_aug)
        if do_dummy_2d:
            rot_x = (-180.0 / 360 * 2 * np.pi, 180.0 / 360 * 2 * np.pi)
            basic = get_patch_size(self.patch_size[1:], rot_x,
                                   (0, 0), (0, 0), (0.7, 1.4))
            self.basic_generator_patch_size = np.array(
                [self.patch_size[0]] + list(basic))
            rot = rot_x
        else:
            self.basic_generator_patch_size = get_patch_size(
                self.patch_size, rot, rot, rot, (0.7, 1.4))
        self.da_params = AugmentParams(
            patch_size=tuple(int(i) for i in self.patch_size),
            rotation_x=rot if not do_dummy_2d else rot,
            do_dummy_2D=do_dummy_2d,
            mask_was_used_for_normalization=self.plans.use_mask_for_norm,
            move_last_seg_channel_to_data=self.cascade,
            all_segmentation_labels=(list(range(1, self.num_classes))
                                     if self.cascade else None),
            cascade_do_cascade_augmentations=self.cascade,
            deep_supervision_scales=self.ds_scales,
            regions=(tuple(self.regions.values())
                     if self.regions else None))
        if self.da_level is not None:
            from .variants import apply_da_level
            apply_da_level(self.da_params, self.da_level)

    def _setup_generators(self):
        if self.dummy_load:
            # benchmarking trainer: random tensors, bypassing I/O + DA
            # (nnUNetTrainerV2_dummyLoad)
            self.tr_gen = self._dummy_generator()
            self.val_gen = self._dummy_generator()
            self.dataset_val = OrderedDict()
            return
        folder = join(self.dataset_directory,
                      self.plans.data_identifier + "_stage%d" % self.stage)
        self.folder_with_preprocessed_data = folder
        if self.unpack_data:
            unpack_dataset(folder)
        dataset = load_dataset(folder)
        splits_file = join(self.dataset_directory, "splits_final.pkl")
        tr_keys, val_keys = do_split(dataset, self.fold, splits_file)
        self.dataset_tr = OrderedDict((k, dataset[k]) for k in tr_keys)
        self.dataset_val = OrderedDict((k, dataset[k]) for k in val_keys)
        self.logger.log(f"fold {self.fold}: {len(tr_keys)} train / "
                        f"{len(val_keys)} val cases")

        if self.cascade:
            missing = [k for k in dataset
                       if not isfile(dataset[k]["data_file"][:-4]
                                     + "_segFromPrevStage.npz")]
            assert len(missing) == 0, (
                "cascade requires segFromPrevStage files for all cases; run "
                "predict_next_stage for every 3d_lowres fold first. Missing: "
                f"{missing[:5]}...")
        sampler_tr = PatchSampler3D(
            self.dataset_tr, self.basic_generator_patch_size,
            self.patch_size, self.batch_size, has_prev_stage=self.cascade,
            oversample_foreground_percent=self.oversample_foreground_percent,
            seed=self.seed)
        sampler_val = PatchSampler3D(
            self.dataset_val, self.patch_size, self.patch_size,
            self.batch_size, has_prev_stage=self.cascade,
            oversample_foreground_percent=self.oversample_foreground_percent,
            seed=self.seed + 100)
        self.tr_gen = BatchPipeline(sampler_tr, self.da_params,
                                    validation=False,
                                    num_threads=self.num_da_threads,
                                    seed=self.seed,
                                    raw=self.device_augment)
        val_params = AugmentParams(
            patch_size=tuple(int(i) for i in self.patch_size),
            mask_was_used_for_normalization=self.plans.use_mask_for_norm,
            move_last_seg_channel_to_data=self.cascade,
            all_segmentation_labels=(list(range(1, self.num_classes))
                                     if self.cascade else None),
            deep_supervision_scales=self.ds_scales)
        self.val_gen = BatchPipeline(sampler_val, val_params,
                                     validation=True, num_threads=1,
                                     seed=self.seed + 1)

    def _dummy_generator(self):
        rng = np.random.RandomState(0)
        num_in = self.num_modalities + (self.num_classes - 1
                                        if self.cascade else 0)
        shape = (self.batch_size, num_in, *[int(i) for i in self.patch_size])
        factors = [[int(round(1 / s)) for s in sc] for sc in self.ds_scales]
        class _Gen:
            def __init__(gs):
                pass
            def __next__(gs):
                data = rng.randn(*shape).astype(np.float32)
                targets = [rng.randint(
                    0, self.num_classes,
                    (self.batch_size,
                     *[int(p) // f for p, f in zip(self.patch_size, fa)])
                    ).astype(np.int32) for fa in factors]
                return {"data": data, "target": targets}
            def stop(gs):
                pass
        return _Gen()

    # ------------------------------------------------------------ loops
    def _to_device(self, batch):
        data = np.moveaxis(batch["data"], 1, -1)
        targets = tuple(batch["target"])
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            return shard_batch(self.mesh, data, targets)
        return jnp.asarray(data), tuple(jnp.asarray(t) for t in targets)

    def run_iteration(self, gen, lr, do_backprop=True,
                      run_online_evaluation=False):
        batch = next(gen)
        if do_backprop and self.device_augment:
            data = jnp.asarray(np.moveaxis(batch["data"], 1, -1))
            seg = jnp.asarray(batch["seg"][:, 0])
            self._aug_key, sub = jax.random.split(self._aug_key)
            data, targets = self.device_aug(sub, data, seg)
        else:
            data, targets = self._to_device(batch)
        extras = self._step_extras()
        if do_backprop:
            self.state, metrics = self.train_step(
                self.state, data, targets, jnp.float32(lr),
                *(extras + self._momentum_extra()))
            self._maybe_dsff_step(data, targets)
            return metrics["loss"]
        m = self.eval_step(self.state.params, data, targets, *extras)
        if run_online_evaluation:
            self._online_tp.append(m["tp"])
            self._online_fp.append(m["fp"])
            self._online_fn.append(m["fn"])
        return m["loss"]

    def _maybe_dsff_step(self, data=None, targets=None):
        if self.state.masks is None or self.dsff_config.fix:
            return
        cfg = self.dsff_config
        if cfg.sparse_init == "GMP":
            return  # GMP prunes per epoch (_maybe_gmp_epoch_prune)
        step = int(self.state.step)
        freq = cfg.update_frequency
        if freq and step % freq == 0:
            dr = dsff.cosine_death_rate(jnp.asarray(step, jnp.float32),
                                        cfg.death_rate, self.t_max)
            grads = None
            if self._dsff_grad_step is not None and data is not None:
                grads = self._dsff_grad_step(self.state.params, data,
                                             targets)
            if cfg.prune_mode == "global":
                # gradual-density schedule (cal_grow_schedule): shrink the
                # regrow budget so density decays toward final_density
                tw = float(sum(m.size for m in self.state.masks.values()))
                tn = float(sum(jnp.sum(m)
                               for m in self.state.masks.values()))
                regrow = dsff.grow_schedule_ratio(
                    step, freq, self.num_batches_per_epoch, cfg.density,
                    cfg.final_density, float(dr), tw, tn, tn / tw,
                    self._regrow_ratio, cfg.init_prune_epoch,
                    cfg.final_prune_epoch)
                self._regrow_ratio = regrow
                self.state = self.mask_update(self.state, dr, grads,
                                              jnp.float32(regrow))
            else:
                self.state = self.mask_update(self.state, dr, grads)
            self.fired_masks = dsff.update_fired(self.fired_masks,
                                                 self.state.masks)
            itop = float(dsff.fired_ratio(self.fired_masks))
            dens = float(dsff.masks_density(self.state.masks,
                                            self.state.params))
            extra = (f" regrow_ratio={self._regrow_ratio:.4f}"
                     if cfg.prune_mode == "global" else "")
            self.logger.log(f"DSFF update at step {step}: death_rate="
                            f"{float(dr):.4f} density={dens:.4f} "
                            f"itop_rate={itop:.4f}{extra}")

    def _maybe_gmp_epoch_prune(self):
        """GMP (truncate_weights_GMP, core_channel.py:436-467): per-epoch
        cubic magnitude-prune ramp toward (1 - density); no regrow."""
        if self.state.masks is None or not self.dsff_config.sparse:
            return
        cfg = self.dsff_config
        if cfg.sparse_init != "GMP" or cfg.fix:
            return
        new_masks = dsff.gmp_prune_masks(
            self.state.params, self.state.masks, self.epoch, cfg.density,
            cfg.init_prune_epoch, cfg.final_prune_epoch, cfg.multiplier)
        params = dsff.apply_masks(self.state.params, new_masks)
        from .train_state import mask_opt_state
        momentum = mask_opt_state(self.state.momentum, new_masks)
        self.state = self.state.replace(params=params, momentum=momentum,
                                        masks=new_masks)
        self.fired_masks = dsff.update_fired(self.fired_masks,
                                             self.state.masks)
        dens = float(dsff.masks_density(self.state.masks,
                                        self.state.params))
        self.logger.log(f"GMP prune at epoch {self.epoch}: "
                        f"density={dens:.4f}")

    def finish_online_evaluation(self):
        tp = np.sum([np.asarray(t) for t in self._online_tp], 0)
        fp = np.sum([np.asarray(t) for t in self._online_fp], 0)
        fn = np.sum([np.asarray(t) for t in self._online_fn], 0)
        dc_per_class = [2 * i / (2 * i + j + k) for i, j, k in
                        zip(tp, fp, fn) if (2 * i + j + k) > 0]
        mean_dc = float(np.mean(dc_per_class)) if dc_per_class else 0.0
        self.all_val_eval_metrics.append(mean_dc)
        self.logger.log("Average global foreground Dice:",
                        [np.round(i, 4) for i in dc_per_class])
        return mean_dc

    def _step_extras(self):
        """Traced per-epoch loss weights (CE->Dice transition trainer)."""
        if self.loss_schedule != "ce_to_dice":
            return ()
        from .lr import ce_to_dice_weights
        wce, wdice = ce_to_dice_weights(self.epoch, self.max_num_epochs)
        return (jnp.float32(wce), jnp.float32(wdice))

    def _momentum_extra(self):
        if self.momentum_schedule != "reduce":
            return ()
        from .lr import reduce_momentum
        return (jnp.float32(reduce_momentum(self.epoch, self.momentum)),)

    def maybe_update_lr(self, epoch=None):
        ep = self.epoch + 1 if epoch is None else epoch
        if self.lr_schedule == "plateau":
            # stepped on train_loss_MA at epoch end (update_train_loss_MA);
            # here we only read the scheduler's current lr
            self.lr = self._plateau.lr
        elif self.lr_schedule == "warmup":
            from .lr import warmup_poly_lr
            self.lr = warmup_poly_lr(ep, self.max_num_epochs,
                                     self.initial_lr)
        elif self.lr_schedule == "fixed":
            from .lr import fixed_schedule_lr
            self.lr = fixed_schedule_lr(ep, self.initial_lr)
        elif self.lr_schedule == "fixed2":
            from .lr import fixed_schedule2_lr
            self.lr = fixed_schedule2_lr(ep, self.max_num_epochs,
                                         self.initial_lr)
        elif self.lr_schedule == "cycle":
            from .lr import cycle_at_end_lr
            self.lr = cycle_at_end_lr(ep, self.initial_lr)
        else:
            self.lr = poly_lr(ep, self.max_num_epochs, self.initial_lr, 0.9)
        self.logger.log("lr:", np.round(self.lr, decimals=6))

    def update_train_loss_MA(self):
        """network_trainer.update_train_loss_MA (:626-631) — feeds the
        ReduceLROnPlateau variants."""
        if self.train_loss_MA is None:
            self.train_loss_MA = self.all_tr_losses[-1]
        else:
            a = self.train_loss_MA_alpha
            self.train_loss_MA = (a * self.train_loss_MA
                                  + (1 - a) * self.all_tr_losses[-1])
        if self._plateau is not None:
            self._plateau.step(self.train_loss_MA)

    def run_training(self):
        if not self.was_initialized:
            self.initialize(True)
        self.save_debug_information()
        while self.epoch < self.max_num_epochs:
            t0 = time.time()
            self.logger.log(f"\nepoch: {self.epoch}")
            self.maybe_update_lr(self.epoch)
            # trace the second epoch (first is compile-dominated)
            if self.profile_dir and self.epoch == 1:
                jax.profiler.start_trace(self.profile_dir)

            losses = []
            for _ in range(self.num_batches_per_epoch):
                losses.append(self.run_iteration(self.tr_gen, self.lr, True))
            if self.profile_dir and self.epoch == 1:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                self.logger.log("profiler trace ->", self.profile_dir)
            tr_loss = float(np.mean([np.asarray(l) for l in losses]))
            self.all_tr_losses.append(tr_loss)
            self.logger.log("train loss : %.4f" % tr_loss)
            self.update_train_loss_MA()
            self._maybe_gmp_epoch_prune()

            self._online_tp, self._online_fp, self._online_fn = [], [], []
            val_losses = []
            for _ in range(self.num_val_batches_per_epoch):
                val_losses.append(self.run_iteration(
                    self.val_gen, self.lr, False, True))
            val_loss = float(np.mean([np.asarray(l) for l in val_losses]))
            self.all_val_losses.append(val_loss)
            self.logger.log("validation loss: %.4f" % val_loss)
            self.finish_online_evaluation()

            self.update_eval_criterion_MA()
            self.epoch += 1
            self.logger.log("This epoch took %f s" % (time.time() - t0))

            if (self.validate_every
                    and self.epoch % self.validate_every == 0
                    and not self.dummy_load):
                # nnUNetTrainerV2_fullEvals: full validation every epoch
                self.validate(
                    do_mirroring=False,
                    validation_folder_name=f"validation_ep{self.epoch:03d}",
                    run_postprocessing_on_folds=False)
            if self.save_every and (self.epoch % self.save_every == 0):
                self.save_checkpoint("latest")
            if (self.best_val_eval_criterion_MA is None
                    or self.val_eval_criterion_MA
                    >= self.best_val_eval_criterion_MA):
                self.best_val_eval_criterion_MA = self.val_eval_criterion_MA
                self.save_checkpoint("best")
            self.plot_progress()
        self.save_checkpoint("final_checkpoint")
        self.tr_gen.stop()
        self.val_gen.stop()

    def update_eval_criterion_MA(self):
        v = self.all_val_eval_metrics[-1] if self.all_val_eval_metrics \
            else -self.all_val_losses[-1]
        if self.val_eval_criterion_MA is None:
            self.val_eval_criterion_MA = v
        else:
            a = self.val_eval_criterion_alpha
            self.val_eval_criterion_MA = a * self.val_eval_criterion_MA \
                + (1 - a) * v

    # ------------------------------------------------------- persistence
    def checkpoint_path(self, which: str) -> str:
        return join(self.output_folder, f"{self.tconv}_model_{which}.model")

    def save_checkpoint(self, which: str):
        sidecar = {
            "init": {"fold": self.fold, "stage": self.stage,
                     "tconv": self.tconv, "batch_dice": self.batch_dice,
                     "base_num_features": self.base_num_features,
                     "cascade": self.cascade},
            "name": self.__class__.__name__,
            "class": f"{self.__class__.__module__}."
                     f"{self.__class__.__name__}",
            "plans": self.plans.to_dict(),
        }
        metadata = {
            "all_tr_losses": self.all_tr_losses,
            "all_val_losses": self.all_val_losses,
            "all_val_eval_metrics": self.all_val_eval_metrics,
            "best_val_eval_criterion_MA": self.best_val_eval_criterion_MA,
            "val_eval_criterion_MA": self.val_eval_criterion_MA,
        }
        if getattr(self, "fired_masks", None) is not None:
            metadata["fired_masks"] = {
                "/".join(k): np.asarray(v)
                for k, v in self.fired_masks.items()}
        save_checkpoint(self.checkpoint_path(which), self.state, self.epoch,
                        metadata, sidecar)
        self.logger.log(f"saved checkpoint {which}")

    def load_checkpoint_file(self, which_or_path: str, train: bool = True):
        path = which_or_path if os.path.sep in which_or_path \
            else self.checkpoint_path(which_or_path)
        if not self.was_initialized:
            self.initialize(train)
        state, epoch, metadata = load_checkpoint(path)
        self.state = state
        self.epoch = epoch
        self.all_tr_losses = metadata.get("all_tr_losses", [])
        self.all_val_losses = metadata.get("all_val_losses", [])
        self.all_val_eval_metrics = metadata.get("all_val_eval_metrics", [])
        self.best_val_eval_criterion_MA = metadata.get(
            "best_val_eval_criterion_MA")
        self.val_eval_criterion_MA = metadata.get("val_eval_criterion_MA")
        if metadata.get("fired_masks") is not None:
            self.fired_masks = {tuple(k.split("/")): jnp.asarray(v)
                                for k, v in metadata["fired_masks"].items()}
        elif state.masks is not None:
            self.fired_masks = {k: jnp.array(v, copy=True)
                                for k, v in state.masks.items()}
        self.logger.log(f"restored checkpoint {path} at epoch {epoch}")

    def plot_progress(self):
        try:
            import matplotlib
            matplotlib.use("agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(10, 6))
            x = list(range(len(self.all_tr_losses)))
            ax.plot(x, self.all_tr_losses, label="loss_tr")
            ax.plot(x, self.all_val_losses, label="loss_val")
            if self.all_val_eval_metrics:
                ax2 = ax.twinx()
                ax2.plot(x, self.all_val_eval_metrics, color="g",
                         label="evaluation metric")
                ax2.set_ylabel("evaluation metric")
            ax.set_xlabel("epoch")
            ax.set_ylabel("loss")
            ax.legend()
            fig.savefig(join(self.output_folder, "progress.png"))
            plt.close(fig)
        except Exception as e:
            self.logger.log("failed to plot:", e)

    # ----------------------------------------------------- validation set
    def validate(self, do_mirroring: bool = True, step_size: float = 0.5,
                 save_softmax: bool = False,
                 validation_folder_name: str = "validation_raw",
                 run_postprocessing_on_folds: bool = True):
        """Sliding-window predict every val case -> export -> evaluate ->
        determine postprocessing. Parity: nnUNetTrainer_simple.validate
        (:1309-1479)."""
        from ..inference.export import save_segmentation_nifti_from_softmax
        from ..evaluation.evaluator import aggregate_scores
        from ..ops.sliding import make_tiled_predictor, predict_volume_tiled

        assert self.was_initialized
        if self.dummy_load:
            self.logger.log("dummy_load trainer: skipping validation")
            return
        if not hasattr(self, "dataset_val"):
            folder = join(self.dataset_directory,
                          self.plans.data_identifier
                          + "_stage%d" % self.stage)
            dataset = load_dataset(folder)
            splits_file = join(self.dataset_directory, "splits_final.pkl")
            _, val_keys = do_split(dataset, self.fold, splits_file)
            self.dataset_val = OrderedDict((k, dataset[k])
                                           for k in val_keys)
        output_folder = join(self.output_folder, validation_folder_name)
        maybe_mkdir_p(output_folder)

        params = self.state.params
        apply_fn = lambda p, x: self.network.apply({"params": p}, x,
                                                   do_ds=False)
        patch = tuple(int(i) for i in self.patch_size)
        n_out_classes = self.net_num_classes
        predictor = make_tiled_predictor(
            apply_fn, patch, n_out_classes, mirror_axes=(0, 1, 2),
            do_mirroring=do_mirroring,
            nonlin="sigmoid" if self.regions else "softmax")
        pred_gt_tuples = []
        for k in self.dataset_val.keys():
            props = load_pickle(self.dataset_val[k]["properties_file"])
            fname = props["list_of_data_files"][0].split(os.sep)[-1][:-12]
            from ..data.dataset import load_case
            case_all = np.asarray(load_case(self.dataset_val[k]))
            data = case_all[:-1]
            if self.cascade:
                from ..training.cascade import move_seg_as_onehot_to_data
                prev = np.load(self.dataset_val[k]["data_file"][:-4]
                               + "_segFromPrevStage.npz")["data"]
                data = move_seg_as_onehot_to_data(
                    data[None], prev[None],
                    list(range(1, self.num_classes)))[0]
            softmax = predict_volume_tiled(
                apply_fn, params, data, patch, n_out_classes,
                step_size=step_size, do_mirroring=do_mirroring,
                predictor=predictor)
            transpose_backward = self.plans.transpose_backward
            softmax = softmax.transpose(
                [0] + [int(i) + 1 for i in transpose_backward])
            softmax_fname = (join(output_folder, fname + ".npz")
                             if save_softmax else None)
            ek = self.export_kwargs or {}
            save_segmentation_nifti_from_softmax(
                softmax, join(output_folder, fname + ".nii.gz"), props,
                ek.get("interpolation_order", 1),
                self.regions_class_order, None, None, softmax_fname, None,
                force_separate_z=ek.get("force_separate_z", None),
                interpolation_order_z=ek.get("interpolation_order_z", 0))
            pred_gt_tuples.append(
                [join(output_folder, fname + ".nii.gz"),
                 join(self.gt_niftis_folder, fname + ".nii.gz")])

        if self.regions:
            # region-based evaluation replaces label-wise scoring AND
            # postprocessing determination (nnUNetTrainerV2BraTSRegions.
            # validate :160-166 — "disable e2enet postprocessing")
            from ..evaluation.region_based_evaluation import \
                evaluate_regions
            evaluate_regions(output_folder, self.gt_niftis_folder,
                             self.regions)
            self.logger.log("validation (regions) done ->", output_folder)
            return
        aggregate_scores(
            pred_gt_tuples, labels=list(range(self.num_classes)),
            json_output_file=join(output_folder, "summary.json"),
            json_name=f"{self.tconv} fold {self.fold}",
            num_threads=2)

        if run_postprocessing_on_folds:
            from ..postprocessing.connected_components import \
                determine_postprocessing
            determine_postprocessing(self.output_folder,
                                     self.gt_niftis_folder,
                                     validation_folder_name,
                                     final_subf_name=validation_folder_name
                                     + "_postprocessed")
        self.logger.log("validation done ->", output_folder)

    def save_debug_information(self):
        dct = {}
        for k, v in self.__dict__.items():
            if k in ("plans", "state", "network", "logger", "tr_gen",
                     "val_gen", "dataset_tr", "dataset_val", "train_step",
                     "eval_step", "mask_update", "da_params"):
                continue
            try:
                json.dumps(v)
                dct[k] = v
            except TypeError:
                dct[k] = str(v)
        save_json(dct, join(self.output_folder, "debug.json"))
