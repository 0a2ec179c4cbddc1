#!/usr/bin/env python
"""Training CLI — flag-surface parity with reference ``trainer.py``.

Top-level flags match reference ``trainer.py:22-52``; class-selectable groups
(--model/--loss/--optimizer/--lr_scheduler/--training_dataset/
--validation_dataset/--logger with ``--<group>_<param>`` reflection flags)
match reference ``trainer.py:55-91`` via
``piv_liteflownet_tpu.utils.config``.

TPU redesign: instead of DataParallel + per-batch ``.cuda()`` copies
(reference ``trainer.py:128-140,371-376``), training runs one jitted SPMD step
over a ``data``-axis mesh (all local devices), with device-side augmentation
and double-buffered host->device prefetch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser():
    from piv_liteflownet_tpu.data import datasets as dsets
    from piv_liteflownet_tpu.training import loss as loss_mod
    from piv_liteflownet_tpu.utils import config as cfgutil
    from piv_liteflownet_tpu.utils import metrics as metrics_mod

    parser = argparse.ArgumentParser(description="Training script for TPU LiteFlowNet")
    parser.add_argument("--start_epoch", type=int, default=1)
    parser.add_argument("--total_epochs", type=int, default=10000, help="Maximum epoch value")
    parser.add_argument("--batch_size", "-b", type=int, default=8, help="Batch size")
    parser.add_argument("--crop_size", type=int, nargs="+", default=[256, 256],
                        help="Spatial crop for training samples")
    parser.add_argument("--rgb_max", type=float, default=255.0)
    parser.add_argument("--weight_decay", "-wd", type=float, default=4e-4)
    parser.add_argument("--bias_decay", "-bd", type=float, default=0.0)
    parser.add_argument("--number_workers", "-nw", "--num_workers", type=int, default=8)
    parser.add_argument("--native_io", action="store_true",
                        help="use the C++ batch loader (libpivio) for training "
                             "ingest when the dataset is file-triplet based "
                             "(PIVData with PNG/TIFF/PNM frames)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute with f32 master params/loss/optimizer "
                             "(measured +26%% step rate; loss curves match f32 "
                             "to 4 decimals — BASELINE.md round 3)")
    parser.add_argument("--number_devices", "-nd", type=int, default=-1,
                        help="number of accelerator devices to use (-1 = all)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--name", default="run", type=str)
    parser.add_argument("--save", "-s", default="./work", type=str)
    parser.add_argument("--validation_frequency", type=int, default=1)
    parser.add_argument("--backup_frequency", type=int, default=25)
    parser.add_argument("--inference_size", type=int, nargs="+", default=[-1, -1])
    parser.add_argument("--pretrained", default="", type=str, metavar="PATH",
                        help="path to pre-trained weights (.paramOnly or .npz)")
    parser.add_argument("--resume", default="", type=str, metavar="PATH",
                        help="path to checkpoint directory to resume from")

    from piv_liteflownet_tpu.models.factory import model_config_registry
    from piv_liteflownet_tpu.training import optim as optim_mod

    # model group: real ModelConfig factories, flags reflected from their
    # signatures (reference trainer.py:57-58 over src/models.py classes)
    cfgutil.add_arguments_for_module(
        parser, model_config_registry(), "model", default="LiteFlowNet",
        parameter_defaults={
            "starting_scale": 10.0,
            "lowest_level": 1,
            "rgb_mean": [0.411618, 0.434631, 0.454253, 0.410782, 0.433645, 0.452793],
        },
    )

    cfgutil.add_arguments_for_module(
        parser, {"MultiScale": loss_mod.MultiScale, "LevelLoss": loss_mod.LevelLoss,
                 "L1Loss": loss_mod.L1Loss, "L2Loss": loss_mod.L2Loss},
        "loss", default="MultiScale",
        parameter_defaults={
            "div_scale": 0.2, "startScale": 1,
            "l_weight": [0.001, 0.001, 0.001, 0.001, 0.001, 0.01], "norm": "L2",
        },
    )
    # optimizer group: every optax-backed registry entry selectable by its
    # torch name, its factory params reflected into --optimizer_* flags
    # (reference trainer.py:60-66 over torch.optim)
    cfgutil.add_arguments_for_module(
        parser, optim_mod.OPTIMIZERS, "optimizer", default="Adam",
    )
    parser.add_argument("--optimizer_lr", type=float, default=1e-3)
    parser.add_argument("--optimizer_low_lr", type=float, default=6e-5,
                        help="fixed lr for NetE levels < 4 (reference trainer.py:406)")
    # lr_scheduler group: stateless epoch->lr functions by torch name
    # (reference trainer.py:68-73 over torch.optim.lr_scheduler)
    cfgutil.add_arguments_for_module(
        parser, optim_mod.SCHEDULERS, "lr_scheduler", default="MultiStepLR",
        skip_params=["base_lr", "epoch"],
        parameter_defaults={"milestones": [-1], "gamma": 0.1},
    )

    dataset_registry = {"PIVData": dsets.PIVData, "PIVH5": dsets.PIVH5, "PIVLMDB": dsets.PIVLMDB}
    cfgutil.add_arguments_for_module(
        parser, dataset_registry, "training_dataset", default="PIVData",
        skip_params=["is_cropped", "transform"],
        parameter_defaults={"root": "./data/piv_datasets", "mode": "train"},
    )
    cfgutil.add_arguments_for_module(
        parser, dataset_registry, "validation_dataset", default="PIVData",
        skip_params=["is_cropped", "transform"],
        parameter_defaults={"root": "./data/piv_datasets", "mode": "val"},
    )
    cfgutil.add_arguments_for_module(
        parser, {"Experiment": metrics_mod.Experiment,
                 "ExistingExperiment": metrics_mod.ExistingExperiment}, "logger",
        default="Experiment",
        parameter_defaults={"project_name": "piv-flownet", "workdir": "./work/experiments"},
    )
    parser._dataset_registry = dataset_registry
    return parser


class Train:
    """Epoch loop: train + periodic validation, best/backup checkpoints
    (reference ``Train`` class, ``trainer.py:98-221``)."""

    def __init__(self, args, logger, loaders, state, train_step, eval_step, tx_labels, mesh):
        self.args = args
        self.experiment = logger
        self.loaders = loaders
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.mesh = mesh
        self.loss_label = "MultiScale-" + getattr(args, "loss_norm", "L2")

    def _epoch(self, key_name: str, epoch: int) -> float:
        import jax

        from piv_liteflownet_tpu.data.loader import PrefetchLoader
        from piv_liteflownet_tpu.parallel.mesh import data_sharding

        loader = self.loaders[key_name]
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)  # resume-stable shuffle order
        training = "train" in key_name
        total = 0.0
        n = 0
        shard = data_sharding(self.mesh) if self.mesh is not None else None

        def host_batches():
            for (im1, im2), target in loader:
                if not training:
                    # center-crop val batches to a /64 size (reference
                    # render_size contract, src/datasets.py:307-315)
                    h, w = im1.shape[1] // 64 * 64, im1.shape[2] // 64 * 64
                    t0, l0 = (im1.shape[1] - h) // 2, (im1.shape[2] - w) // 2
                    im1 = im1[:, t0 : t0 + h, l0 : l0 + w]
                    im2 = im2[:, t0 : t0 + h, l0 : l0 + w]
                    target = target[:, t0 : t0 + h, l0 : l0 + w]
                yield (im1, im2), target

        # Double-buffered host->device prefetch: transfers run on a background
        # thread while the accelerator executes the previous step (the JAX
        # answer to the reference's pin_memory DataLoader, trainer.py:305-310).
        batches = (PrefetchLoader(host_batches(), prefetch=2, sharding=shard)
                   if shard is not None else host_batches())

        # Metric readback is deferred: float(loss) blocks on the step, so
        # draining it per-batch would serialize host I/O with compute.
        pending = []  # (batch_idx, device scalar)

        def flush():
            nonlocal total, n
            for bi, dev_loss in pending:
                batch_loss = float(dev_loss)
                assert batch_loss == batch_loss, "NaN loss"
                step_count = (epoch - 1) * len(loader) + (bi + 1)
                self.experiment.log_metric(
                    "_".join([key_name, "batch", self.loss_label]), batch_loss,
                    step=step_count, epoch=epoch)
                total += batch_loss
                n += 1
            pending.clear()

        for batch_idx, ((im1, im2), target) in enumerate(batches):
            if training:
                key = jax.random.PRNGKey(self.args.seed * 100003 + epoch * 1009 + batch_idx)
                self.state, metrics = self.train_step(self.state, im1, im2, target, key)
            else:
                metrics = self.eval_step(self.state.params, im1, im2, target)
            pending.append((batch_idx, metrics["loss"]))
            if len(pending) >= 16:
                flush()
        flush()
        return total / max(n, 1)

    def save_model(self, epoch, best_err, is_best, filename=None):
        import jax

        from piv_liteflownet_tpu.utils.checkpoint import save_checkpoint

        state = {
            "params": jax.tree.map(np.asarray, self.state.params),
            # full optimizer state (Adam moments + injected per-group lrs) so
            # resume is bit-faithful (reference trainer.py:160-174,383-396)
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "epoch": np.asarray(epoch),
            "best_epe": np.asarray(best_err),
            "step": np.asarray(self.state.step),
        }
        from piv_liteflownet_tpu.training.optim import flat_opt_mode

        meta = {"arch": self.args.model, "opt": self.args.optimizer,
                "exp_key": self.experiment.get_key(), "epoch": int(epoch),
                "best_EPE": float(best_err),
                # optax.flatten changes the opt-state pytree structure;
                # restore must run under the same PIV_FLAT_OPT mode
                "flat_opt": flat_opt_mode()}
        save_checkpoint(state, is_best, self.args.save, self.args.model,
                        filename=filename, metadata=meta)

    def __call__(self):
        from piv_liteflownet_tpu.training.optim import schedule_lr, set_group_lrs

        best_err = getattr(self.args, "best_err", 1e8)
        best_epoch = self.args.start_epoch
        for epoch in range(self.args.start_epoch, self.args.total_epochs + 1):
            self.experiment.log_current_epoch(epoch)
            for key in self.loaders:
                if "train" in key:
                    loss_val = self._epoch(key, epoch)
                elif "val" in key and ((epoch - 1) % self.args.validation_frequency) == 0:
                    loss_val = self._epoch(key, epoch)
                    is_best = loss_val < best_err
                    if is_best:
                        best_err = loss_val
                        best_epoch = int(epoch)
                    self.save_model(epoch, best_err, is_best)
                else:
                    continue
                self.experiment.log_metric("_".join([key, self.loss_label]), loss_val,
                                           step=epoch, epoch=epoch)
                self.experiment.log_metric("best_epoch", best_epoch)

            if self.args.lr_scheduler not in ("None", "ConstantLR"):
                from piv_liteflownet_tpu.utils.config import kwargs_from_args

                sk = kwargs_from_args(self.args, "lr_scheduler")
                lr = schedule_lr(self.args.lr_scheduler, self.args.optimizer_lr, epoch, **sk)
                low = schedule_lr(self.args.lr_scheduler, self.args.optimizer_low_lr, epoch, **sk)
                self.state.opt_state = set_group_lrs(
                    self.state.opt_state, {"w_hi": lr, "b_hi": lr, "w_lo": low, "b_lo": low})
                self.experiment.log_metric("current_lr", lr, step=epoch, epoch=epoch)

            if ((epoch - 1) % self.args.backup_frequency) == 0:
                self.save_model(epoch, best_err, False, filename=f"backup_{epoch}")


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp

    from piv_liteflownet_tpu.data.datasets import get_transform
    from piv_liteflownet_tpu.data.loader import BatchLoader
    from piv_liteflownet_tpu.models.convert import load_param_only
    from piv_liteflownet_tpu.models.liteflownet import ModelConfig, init_params
    from piv_liteflownet_tpu.parallel.mesh import make_mesh, replicated
    from piv_liteflownet_tpu.parallel.train_step import TrainState, make_eval_step, make_train_step
    from piv_liteflownet_tpu.training.optim import make_optimizer
    from piv_liteflownet_tpu.utils import config as cfgutil
    from piv_liteflownet_tpu.utils.checkpoint import load_metadata, load_params_npz, restore_checkpoint
    from piv_liteflownet_tpu.utils.timer import TimerBlock

    from piv_liteflownet_tpu.utils.timer import log_arguments, set_proc_title

    log_args = {k: v for k, v in sorted(vars(args).items()) if "logger" not in k}
    set_proc_title(f"piv_liteflownet_tpu.trainer {args.name}")
    with TimerBlock("Parsing Arguments") as block:
        log_arguments(block, args, parser)

    with TimerBlock("Building {} model".format(args.model)) as block:
        cfg = cfgutil.instance_from_args(parser, args, "model")
        assert isinstance(cfg, ModelConfig)
        params = init_params(cfg, jax.random.PRNGKey(args.seed))
        if args.pretrained:
            if args.pretrained.endswith(".npz"):
                params = load_params_npz(args.pretrained)
            else:
                params = load_param_only(cfg, args.pretrained)
            block.log(f"Loaded pretrained weights from {args.pretrained}")
        n_params = sum(int(np.prod(p.shape)) for p in params.values())
        block.log(f"Number of parameters: {n_params}")

    with TimerBlock("Initializing datasets") as block:
        train_ds = cfgutil.instance_from_args(parser, args, "training_dataset")
        train_loader = None
        if args.native_io:
            from piv_liteflownet_tpu.data.loader import native_train_loader_for

            train_loader = native_train_loader_for(
                train_ds, batch_size=args.batch_size,
                num_workers=args.number_workers, shuffle=True,
                seed=args.seed, drop_last=True)
            block.log("native ingest: " + ("libpivio" if train_loader else
                                           "inapplicable, Python loader"))
        if train_loader is None:
            train_loader = BatchLoader(train_ds, batch_size=args.batch_size,
                                       num_workers=args.number_workers, shuffle=True,
                                       seed=args.seed, drop_last=True)
        loaders = {"train": train_loader}
        try:
            val_ds = cfgutil.instance_from_args(parser, args, "validation_dataset")
            loaders["val"] = BatchLoader(val_ds, batch_size=args.batch_size,
                                         num_workers=args.number_workers)
        except FileNotFoundError:
            block.log("No validation dataset found — training without validation")
        block.log(f"train={len(train_ds)} samples")

    with TimerBlock("Initializing mesh + optimizer + train step") as block:
        n_dev = args.number_devices if args.number_devices > 0 else len(jax.devices())
        mesh = make_mesh(n_dev)
        block.log(f"mesh: {mesh}")
        opt_kwargs = cfgutil.kwargs_from_args(args, "optimizer", skip=("lr", "low_lr"))
        tx, labels = make_optimizer(params, cfg.lowest_level, optimizer=args.optimizer,
                                    lr=args.optimizer_lr, low_lr=args.optimizer_low_lr,
                                    weight_decay=args.weight_decay, bias_decay=args.bias_decay,
                                    **opt_kwargs)
        loss_obj = cfgutil.instance_from_args(parser, args, "loss")
        pipeline = get_transform(crop_size=tuple(args.crop_size), mode="train")
        train_step = make_train_step(
            cfg, loss_obj, tx, mesh=mesh, pipeline=pipeline,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            # each prefetched batch is consumed exactly once -> donate its HBM
            donate_inputs=True)
        eval_step = make_eval_step(cfg, loss_obj, mesh=mesh)
        state = jax.device_put(
            TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), replicated(mesh))

    with TimerBlock("Initializing logger") as block:
        logger = cfgutil.instance_from_args(parser, args, "logger")
        logger.set_name(args.name)
        logger.log_parameters(log_args)

        args.best_err = 1e8
        if args.resume:
            meta = load_metadata(args.resume)
            from piv_liteflownet_tpu.training.optim import flat_opt_mode
            saved_flat = (meta or {}).get("flat_opt", "0")
            if saved_flat != flat_opt_mode():
                raise SystemExit(
                    f"checkpoint was saved with PIV_FLAT_OPT={saved_flat} but "
                    f"this run has PIV_FLAT_OPT={flat_opt_mode()}; the optimizer "
                    "state pytree structure differs — set the env var to match")
            abstract = {"params": state.params, "opt_state": state.opt_state,
                        "epoch": np.asarray(0), "best_epe": np.asarray(0.0),
                        "step": np.asarray(0)}
            restored = restore_checkpoint(args.resume, abstract)
            opt_state = jax.device_put(restored["opt_state"], replicated(mesh))
            args.start_epoch = int(restored["epoch"]) + 1
            args.best_err = float(restored["best_epe"])
            if args.lr_scheduler not in ("None", "ConstantLR"):
                # the original run stepped the scheduler AFTER the checkpoint
                # was written (end of epoch E); re-derive epoch-E group lrs so
                # epoch E+1 resumes under the same schedule (schedulers here
                # are stateless epoch->lr functions — no state dict needed,
                # unlike reference trainer.py:434-435)
                from piv_liteflownet_tpu.training.optim import schedule_lr, set_group_lrs
                e = args.start_epoch - 1
                sk = cfgutil.kwargs_from_args(args, "lr_scheduler")
                lr = schedule_lr(args.lr_scheduler, args.optimizer_lr, e, **sk)
                low = schedule_lr(args.lr_scheduler, args.optimizer_low_lr, e, **sk)
                opt_state = set_group_lrs(
                    opt_state, {"w_hi": lr, "b_hi": lr, "w_lo": low, "b_lo": low})
            state = TrainState(
                jax.device_put(restored["params"], replicated(mesh)),
                opt_state, jnp.asarray(restored["step"]))
            block.log(f"Resumed from {args.resume} at epoch {args.start_epoch}")

        os.makedirs(args.save, exist_ok=True)
        with open(os.path.join(args.save, "args.txt"), "w") as f:
            for k, v in sorted(vars(args).items()):
                f.write(f"{k}: {v}\n")

    trainer = Train(args, logger, loaders, state, train_step, eval_step, labels, mesh)
    trainer()


if __name__ == "__main__":
    main()
