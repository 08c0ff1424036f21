"""Train CLI.

Parity: reference simple_main.py (:33-220): resolves the task/plans,
instantiates the trainer (Tconv dispatch), optional DSFF sparse config
(sparselearning add_sparse_args flags, core_channel.py:17-31), runs training
(+ optional validation only / continue).

Usage:
  python -m e2enet_tpu.cli.train --task 4 --fold 0 --Tconv shiftConvPP \
      --sparse True --sparse_init uniform --growth random --density 0.2 \
      --death-rate 0.5 --update_frequency 1200 --epochs 1000 --batches 250
"""
import argparse

from .. import paths
from ..plans import Plans
from ..training.dsff import DSFFConfig
from ..training.trainer import TPUTrainer
from ..utils.files import isfile, join
from ..utils.task_names import convert_id_to_task_name


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


def get_default_configuration(network: str, task: str,
                              plans_identifier: str = "nnUNetPlansv2.1"):
    """Resolve plans file / output dir / stage for a task (parity:
    run/default_configuration.py:34-80)."""
    preproc_dir = join(paths.require(paths.get_preprocessing_output_dir(),
                                     "preprocessed dir"), task)
    suffix = "_plans_2D" if network == "2d" else "_plans_3D"
    plans_json = join(preproc_dir, plans_identifier + suffix + ".json")
    plans_pkl = join(preproc_dir, plans_identifier + suffix + ".pkl")
    plans_file = plans_json if isfile(plans_json) else plans_pkl
    plans = Plans.load(plans_file)
    possible_stages = sorted(plans.plans_per_stage.keys())
    if network in ("3d_lowres",) and len(possible_stages) == 1:
        raise RuntimeError("3d_lowres only applies to multi-stage plans")
    if network in ("3d_cascade_fullres",) and len(possible_stages) == 1:
        raise RuntimeError(
            "3d_cascade_fullres requires multi-stage plans (3d_lowres)")
    stage = (possible_stages[0] if network == "3d_lowres"
             else possible_stages[-1])
    results_dir = paths.require(paths.get_results_dir(), "RESULTS_FOLDER")
    output_folder = join(results_dir, network, task,
                         "TPUTrainer__" + plans_identifier)
    batch_dice = network != "2d"
    return plans, output_folder, preproc_dir, stage, batch_dice


def main(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", type=str, default="3d_fullres")
    parser.add_argument("--task", type=str, required=True)
    parser.add_argument("--fold", type=str, default="0",
                        help="0..4 or 'all'")
    parser.add_argument("--Tconv", type=str, default="shiftConvPP")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--batches", type=int, default=250,
                        help="batches per epoch")
    parser.add_argument("--val_batches", type=int, default=50)
    parser.add_argument("--base_features", type=int, default=48)
    parser.add_argument("-c", "--continue_training", action="store_true")
    parser.add_argument("--validation_only", action="store_true")
    parser.add_argument("--valbest", action="store_true")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="train through the Pallas fused block kernels "
                             "(experimental: higher HBM peak in backward)")
    parser.add_argument("--remat", choices=["auto", "on", "off"],
                        default="auto",
                        help="rematerialization in the backward: auto = "
                             "off for the bf16 fused+quadrant production "
                             "path (fits HBM and is ~10%% faster), on "
                             "otherwise")
    parser.add_argument("--no_fused", action="store_true",
                        help="force-disable the Pallas fused block kernels")
    parser.add_argument("-p", "--plans_identifier", type=str,
                        default="nnUNetPlansv2.1")
    parser.add_argument("-tr", "--trainer_variant", type=str,
                        default="TPUTrainer",
                        help="named variant preset (see training/variants)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="multi-device data-parallel training (DDP "
                             "equivalent via jax mesh)")
    parser.add_argument("--spatial_parallel", type=int, default=1)
    parser.add_argument("--device_augment", action="store_true",
                        help="run the augmentation chain on-device (jitted; "
                             "trilinear spatial — see ops/device_augment.py "
                             "for deviations vs the reference host chain)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--da_threads", type=int, default=1)
    # DSFF flags (parity: add_sparse_args)
    parser.add_argument("--sparse", type=str2bool, default=False)
    parser.add_argument("--sparse_init", type=str, default="uniform")
    parser.add_argument("--growth", type=str, default="random")
    parser.add_argument("--death", type=str, default="magnitude")
    parser.add_argument("--death-rate", dest="death_rate", type=float,
                        default=0.5)
    parser.add_argument("--density", type=float, default=0.3)
    parser.add_argument("--final_density", type=float, default=0.05)
    parser.add_argument("--update_frequency", type=int, default=1200)
    parser.add_argument("--fix", type=str2bool, default=False)
    parser.add_argument("--prune_mode", type=str, default="local",
                        choices=("local", "global"),
                        help="local: per-layer density-preserving "
                        "truncate_weights; global: cross-layer prune/grow "
                        "with the gradual density->final_density schedule")
    parser.add_argument("--init-prune-epoch", dest="init_prune_epoch",
                        type=int, default=0)
    parser.add_argument("--final-prune-epoch", dest="final_prune_epoch",
                        type=int, default=1000)
    parser.add_argument("--multiplier", type=int, default=1,
                        help="GMP epoch-window multiplier")
    parser.add_argument("--granularity", type=str, default="auto",
                        choices=("auto", "kernel", "element", "row"),
                        help="DSFF mask granularity; 'row' = TPU-native "
                        "structured mode (whole fusion input channels — "
                        "sparse inference kernels can cash the FLOP cut)")
    a = parser.parse_args(args)

    task = a.task
    if not task.startswith("Task"):
        task = convert_id_to_task_name(int(task))
    fold = a.fold if a.fold == "all" else int(a.fold)

    plans, output_folder, preproc_dir, stage, batch_dice = \
        get_default_configuration(a.network, task, a.plans_identifier)

    dsff_cfg = None
    if a.sparse:
        dsff_cfg = DSFFConfig(
            sparse=True, sparse_init=a.sparse_init, growth=a.growth,
            death=a.death, death_rate=a.death_rate, density=a.density,
            final_density=a.final_density,
            update_frequency=a.update_frequency, fix=a.fix,
            prune_mode=a.prune_mode, init_prune_epoch=a.init_prune_epoch,
            final_prune_epoch=a.final_prune_epoch, multiplier=a.multiplier,
            granularity=a.granularity)

    cascade = a.network == "3d_cascade_fullres"
    from ..training.variants import resolve_variant
    preset = resolve_variant(a.trainer_variant)
    kwargs = dict(
        stage=stage, batch_dice=batch_dice, tconv=a.Tconv, cascade=cascade,
        max_num_epochs=a.epochs, num_batches_per_epoch=a.batches,
        num_val_batches_per_epoch=a.val_batches,
        fp16=not a.fp32, dsff_config=dsff_cfg, seed=a.seed,
        num_da_threads=a.da_threads, base_num_features=a.base_features,
        num_devices=a.num_devices, spatial_parallel=a.spatial_parallel,
        device_augment=a.device_augment,
        fused=False if a.no_fused else (True if a.fused else None),
        remat={"auto": None, "on": True, "off": False}[a.remat])
    kwargs.update({k: v for k, v in preset.items()
                   if k in ("max_num_epochs", "loss_name", "momentum",
                            "initial_lr", "da_level", "dummy_load", "fp16",
                            "cascade", "optimizer", "norm_op", "nonlin",
                            "lr_schedule", "momentum_schedule",
                            "loss_kwargs", "loss_schedule",
                            "num_conv_per_stage", "seg_bias",
                            "nonlin_before_norm", "batch_dice",
                            "base_num_features", "regions", "ds_mode",
                            "validate_every", "export_kwargs",
                            "conv_kernel")})
    if "tconv" in preset:
        # architecture-swapping variants (ResencUNet) override -Tconv
        kwargs["tconv"] = preset["tconv"]
    if "da" in preset:
        kwargs["da_level"] = preset["da"]
    if "loss" in preset:
        kwargs["loss_name"] = preset["loss"]
    trainer = TPUTrainer(plans, fold, output_folder,
                         dataset_directory=preproc_dir, **kwargs)
    trainer.initialize(not a.validation_only)

    if not a.validation_only:
        if a.continue_training and isfile(trainer.checkpoint_path("latest")):
            trainer.load_checkpoint_file("latest")
        trainer.run_training()
    else:
        which = "best" if a.valbest else "final_checkpoint"
        trainer.load_checkpoint_file(which, train=False)
    trainer.validate()

    if a.network == "3d_lowres" and not a.validation_only:
        # cascade: predict this fold's validation cases at the fullres
        # stage geometry (simple_main.py:213-215 / run_training.py)
        from ..training.cascade import predict_next_stage
        next_stage_folder = join(
            preproc_dir, plans.data_identifier
            + "_stage%d" % sorted(plans.plans_per_stage.keys())[-1])
        predict_next_stage(trainer, next_stage_folder)


if __name__ == "__main__":
    main()
