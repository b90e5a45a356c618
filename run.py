#!/usr/bin/env python
"""Training CLI (reference: run.py).

Hydra-style composition over ``configs/`` with the same override grammar:

    python run.py runner=mgfn                      # select the MGFN runner
    python run.py runner=mgfn data.batch_size=8    # dotted value overrides
    python run.py runner=mgfn data.local_path=/data/features trainer.max_epochs=50

Hydra CLI conveniences carried over (the reference gets these from Hydra
itself, run.py:15):

    python run.py --help                           # groups, choices, flags
    python run.py runner=mgfn --cfg                # print the composed config
    python run.py -m runner=mgfn seed=1,2,3        # multirun sweep

As in the reference (configs/runner/default.yaml has no model), a real run
requires ``runner=mgfn``.
"""

from __future__ import annotations

import itertools
import os
import sys

HELP = """\
usage: python run.py [GROUP=CHOICE ...] [KEY=VALUE ...] [flags]

Hydra-style overrides (reference: run.py:15, configs/default.yaml):
  GROUP=CHOICE      select a config-group file, e.g. runner=mgfn
  KEY=VALUE         dotted value override, e.g. data.batch_size=8 or seed=1
  +KEY=VALUE        add a key that is not in the composed config
  ~KEY[=VALUE]      delete a key (=VALUE must match the current value);
                    ~GROUP drops a config group from the defaults list

flags:
  -h, --help        show this help and exit
  --cfg             print the composed config as YAML and exit
  -m, --multirun    sweep comma-separated override values, e.g.
                    `-m runner=mgfn seed=1,2,3` runs the cartesian product
                    sequentially; each job writes under --multirun-dir
  --multirun-dir D  sweep output root (default: multirun)

config groups (configs/):
"""


def print_help(config_dir: str) -> None:
    sys.stdout.write(HELP)
    for root, dirs, files in sorted(os.walk(config_dir)):
        dirs.sort()
        group = os.path.relpath(root, config_dir).replace(os.sep, "/")
        if group == ".":
            continue
        choices = sorted(f[:-5] for f in files if f.endswith(".yaml"))
        if choices:
            print(f"  {group}: {', '.join(choices)}")
    print(
        "\na real run requires `runner=mgfn` (or rtfm / sultani) — the "
        "default runner\ngroup has model_class: null, like the reference."
    )


def expand_multirun(argv):
    """Cartesian product of comma-separated override values (Hydra -m).

    Only bare comma lists sweep; YAML collections / quoted values
    (``data.x=[1,2]``, ``key='a,b'``) stay single values.
    """
    per_arg = []
    for arg in argv:
        key, eq, value = arg.partition("=")
        if (
            eq
            and "," in value
            and not any(ch in value for ch in "[]{}\"'")
        ):
            per_arg.append([f"{key}={v}" for v in value.split(",")])
        else:
            per_arg.append([arg])
    return [list(combo) for combo in itertools.product(*per_arg)]


def run_multirun(config_dir: str, argv, sweep_dir: str) -> None:
    """Run each sweep job in a subprocess, Hydra-multirun style.

    Each job gets its own writer paths ({sweep_dir}/{job}/...) unless the
    sweep args set them explicitly; data paths are untouched (use absolute
    paths, as with Hydra's chdir behavior).
    """
    import json
    import subprocess

    from anomaly_detection_on_video_tpu.config import compose

    jobs = expand_multirun(argv)
    os.makedirs(sweep_dir, exist_ok=True)
    explicit = {arg.partition("=")[0].lstrip("+~") for arg in argv}
    failures = 0
    with open(os.path.join(sweep_dir, "multirun.jsonl"), "a") as log:
        for idx, job_args in enumerate(jobs):
            job_dir = os.path.join(sweep_dir, str(idx))
            os.makedirs(job_dir, exist_ok=True)
            extra = []
            if "trainer.log_path" not in explicit:
                extra.append(
                    f"trainer.log_path={os.path.join(job_dir, 'metrics.jsonl')}"
                )
            try:
                cfg = compose(config_dir, "default", job_args)
            except (ValueError, KeyError, FileNotFoundError) as exc:
                msg = exc.args[0] if exc.args else exc
                raise SystemExit(
                    f"config error in multirun job {idx}"
                    f" ({' '.join(job_args)}): {msg}\n(see python run.py --help)"
                )
            trainer_cfg = cfg.get("trainer", {})
            if (
                (trainer_cfg.get("checkpoint") or {}).get("dirpath")
                and "trainer.checkpoint.dirpath" not in explicit
            ):
                extra.append(
                    "trainer.checkpoint.dirpath="
                    + os.path.join(job_dir, "checkpoints")
                )
            if (
                trainer_cfg.get("figure_dir")
                and "trainer.figure_dir" not in explicit
            ):
                extra.append(
                    f"trainer.figure_dir={os.path.join(job_dir, 'figures')}"
                )
            print(f"[multirun] job {idx}/{len(jobs)}: {' '.join(job_args)}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *job_args, *extra]
            )
            if proc.returncode:
                failures += 1
            log.write(
                json.dumps(
                    {
                        "job": idx,
                        "dir": job_dir,
                        "overrides": job_args,
                        "returncode": proc.returncode,
                    }
                )
                + "\n"
            )
            log.flush()
    if failures:
        raise SystemExit(f"multirun: {failures} of {len(jobs)} jobs failed")


def build_mesh(trainer_cfg):
    """Device mesh from the trainer config.

    ``tensor_parallel: N > 1`` builds a 2-D (data, model) DP x TP mesh —
    weights/optimizer moments shard over the model axis via
    parallel.tensor_parallel_specs (same shape as __graft_entry__'s
    multichip dryrun); otherwise ``data_parallel: true`` builds the 1-D
    data mesh. Returns None when neither applies (single device).
    """
    tensor_parallel = int(trainer_cfg.get("tensor_parallel", 1))
    if not trainer_cfg.get("data_parallel", False) and tensor_parallel <= 1:
        return None
    import jax

    from anomaly_detection_on_video_tpu.parallel import local_mesh, make_mesh

    n_devices = len(jax.devices())
    if tensor_parallel > 1:
        if n_devices % tensor_parallel:
            raise SystemExit(
                f"trainer.tensor_parallel={tensor_parallel} does not "
                f"divide the {n_devices} available devices"
            )
        return make_mesh(
            (n_devices // tensor_parallel, tensor_parallel),
            ("data", "model"),
        )
    if n_devices > 1:
        return local_mesh()
    return None


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)

    from anomaly_detection_on_video_tpu.config import compose, instantiate, locate

    config_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")

    if "-h" in argv or "--help" in argv:
        print_help(config_dir)
        return
    print_cfg = "--cfg" in argv
    multirun = False
    sweep_dir = "multirun"
    while "--multirun-dir" in argv:
        i = argv.index("--multirun-dir")
        try:
            sweep_dir = argv[i + 1]
        except IndexError:
            raise SystemExit("--multirun-dir needs a directory argument")
        del argv[i : i + 2]
    for flag in ("--cfg", "-m", "--multirun"):
        while flag in argv:
            multirun = multirun or flag != "--cfg"
            argv.remove(flag)

    if multirun:
        run_multirun(config_dir, argv, sweep_dir)
        return

    try:
        cfg = compose(config_dir, "default", argv)
    except (ValueError, KeyError, FileNotFoundError) as exc:
        # a mistyped override should read like a CLI error, not a traceback
        msg = exc.args[0] if exc.args else exc
        raise SystemExit(f"config error: {msg}\n(see python run.py --help)")

    if print_cfg:
        import yaml

        shown = {k: v for k, v in cfg.items() if k != "_choices_"}
        sys.stdout.write(yaml.safe_dump(shown, sort_keys=False))
        return

    # DCN multi-host training: rendezvous BEFORE the backend initializes so
    # jax.devices() is global and build_mesh() spans every host. Writers
    # (jsonl/W&B/figures/checkpoints) then gate to process 0; every process
    # feeds the same deterministic batches and the train step globalizes
    # them onto the mesh (training/runner.make_train_step).
    trainer_cfg = cfg.get("trainer", {})
    if trainer_cfg.get("compile_cache"):
        from anomaly_detection_on_video_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache(trainer_cfg["compile_cache"])
    if trainer_cfg.get("multihost"):
        from anomaly_detection_on_video_tpu.parallel import initialize_multihost

        initialize_multihost(
            coordinator=trainer_cfg.get("coordinator"),
            num_processes=trainer_cfg.get("num_processes"),
            process_id=trainer_cfg.get("process_id"),
            autodetect=trainer_cfg.get("coordinator") is None,
        )
    import jax

    is_primary = jax.process_index() == 0

    runner_cfg = cfg.get("runner") or {}
    if not runner_cfg.get("model_class"):
        raise SystemExit(
            "no model selected — run with `runner=mgfn` "
            "(the default runner group has model_class: null, matching the "
            "reference configs/runner/default.yaml)"
        )

    model_config = instantiate(runner_cfg["model_config"])
    model = locate(runner_cfg["model_class"])(model_config)

    data_cfg = cfg.get("data", {})

    from anomaly_detection_on_video_tpu.data import build_feature_dataset
    from anomaly_detection_on_video_tpu.training import VideoAnomalyDetectionRunner
    from anomaly_detection_on_video_tpu.training.runner import DataConfigError
    from anomaly_detection_on_video_tpu.training.checkpoints import TopKCheckpointer
    from anomaly_detection_on_video_tpu.training.loggers import (
        ConsoleLogger,
        JsonlLogger,
        WandbLogger,
    )

    # non-primary processes write nothing: no log files, no W&B run, no
    # checkpoints — they contribute their mesh shards and read the same
    # replicated metrics
    loggers = [ConsoleLogger()] if is_primary else []
    log_path = trainer_cfg.get("log_path", "logs/metrics.jsonl")
    if log_path and is_primary:
        loggers.append(JsonlLogger(log_path))
    if cfg.get("wandb_key") and is_primary:
        # run-name parity: ${hydra:runtime.choices.data}-${...runner}-${now}
        # (reference configs/trainer/logger/wandb.yaml:3)
        import datetime

        choices = cfg.get("_choices_", {})
        stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
        run_name = (
            f"{choices.get('data', 'data')}-"
            f"{choices.get('runner', 'runner')}-{stamp}"
        )
        wandb_cfg = trainer_cfg.get("logger") or {}
        loggers.append(
            WandbLogger(
                project=wandb_cfg.get(
                    "project", "anomaly-detection-on-video-tpu"
                ),
                name=run_name,
                key=cfg["wandb_key"],
                # reference log_model: all uploads checkpoints as artifacts
                log_model=bool(wandb_cfg.get("log_model", False)),
            )
        )

    checkpointer = None
    ckpt_cfg = trainer_cfg.get("checkpoint", {})
    if ckpt_cfg.get("dirpath"):
        # every process opens the directory (a multihost resume must
        # restore the same state everywhere) but only process 0 writes
        checkpointer = TopKCheckpointer(
            ckpt_cfg["dirpath"],
            top_k=int(ckpt_cfg.get("save_top_k", 10)),
        )
        if is_primary and not trainer_cfg.get("eval_only"):
            # self-describing checkpoints (role of the reference's
            # save_hyperparameters, src/runner.py:23): infer.py rebuilds
            # the model from this without --model-config flags
            # (eval_only reads a checkpoint, it must not rewrite its hparams)
            checkpointer.write_metadata(
                {
                    "model_name": cfg.get("_choices_", {}).get("runner"),
                    "model_class": runner_cfg["model_class"],
                    "model_config": runner_cfg["model_config"],
                    "optimizer": runner_cfg.get("optimizer", {}),
                    "data": data_cfg,
                    "seed": cfg.get("seed", 0),
                }
            )

    mesh = build_mesh(trainer_cfg)

    runner = VideoAnomalyDetectionRunner(
        model,
        optimizer_cfg=runner_cfg.get("optimizer", {}),
        data_cfg=data_cfg,
        mesh=mesh,
        loggers=loggers,
        checkpointer=checkpointer if is_primary else None,
        seed=int(cfg.get("seed", 0)),
        eval_batch_videos=int(trainer_cfg.get("eval_batch_videos", 8)),
        precision=str(trainer_cfg.get("precision", "32-true")),
        grad_clip=trainer_cfg.get("gradient_clip_val"),
        accumulate_grad_batches=(
            # None-check, not `or`: an explicit 0/false must reach the
            # runner's >=1 validation instead of being coerced to 1
            1
            if trainer_cfg.get("accumulate_grad_batches") is None
            else int(trainer_cfg["accumulate_grad_batches"])
        ),
    )

    stream = data_cfg.get("stream", "rgb")
    expected_channels = {"rgb": 2048, "flow": 2048, "both": 4096}.get(stream)
    model_channels = getattr(model_config, "channels", None)
    if (
        expected_channels
        and model_channels
        and model_channels != expected_channels
    ):
        print(
            f"warning: data.stream={stream} produces {expected_channels}-d "
            f"features but the model expects channels={model_channels} — "
            f"set runner.model_config.channels={expected_channels}",
            file=sys.stderr,
        )

    def data_kwargs(mode):
        return dict(
            local_path=data_cfg.get(f"{mode}_path") or data_cfg.get("local_path"),
            cache_dir=data_cfg.get("cache_dir"),
            revision=data_cfg.get("revision", "main"),
            dynamic_load=bool(data_cfg.get("dynamic_load", False)),
            stream=stream,
        )

    def load_split(mode, **kw):
        # missing local paths and failed hub downloads (zero-network hosts)
        # are user errors, not tracebacks
        try:
            return build_feature_dataset(mode, **kw)
        except FileNotFoundError as exc:
            raise SystemExit(f"data error: {exc}")

    valid_dataset = load_split(
        "test",
        ground_truth_path=data_cfg.get("ground_truth_path"),
        **data_kwargs("test"),
    )

    if trainer_cfg.get("eval_only"):
        # evaluate a checkpoint's frame-level AUC on the test split without
        # touching (or requiring) train features — e.g. to score converted
        # official weights. No reference counterpart (its runner only
        # evaluates inside fit, src/runner.py:42-90).
        import json

        import numpy as np

        from anomaly_detection_on_video_tpu.training.runner import evaluate

        if checkpointer is None:
            raise SystemExit(
                "trainer.eval_only=true requires trainer.checkpoint.dirpath"
            )
        channels = getattr(model_config, "channels", 2048)
        runner.init_state(np.zeros((2, 10, 32, channels + 1), np.float32))
        try:
            restored = checkpointer.restore(
                runner.state, step=trainer_cfg.get("checkpoint_step", "latest")
            )
        except ValueError as exc:
            # a garbage-collected step or a typo'd selector: a CLI error
            # naming the knob, not a traceback (same rule as infer.py)
            raise SystemExit(f"trainer.checkpoint_step: {exc}")
        runner.restore(restored)
        if int(runner.state.step) == 0:
            raise SystemExit(
                "eval_only: no checkpoint found under "
                f"{trainer_cfg['checkpoint']['dirpath']!r} — evaluating "
                "random weights would be meaningless"
            )
        result = evaluate(
            runner.state,
            valid_dataset,
            int(data_cfg.get("frames_per_clip", 16)),
            runner._eval_step,
            batch_videos=runner.eval_batch_videos,
            pad_groups=True,
        )
        metrics = {
            "step": int(runner.state.step),
            "valid/rec_auc": result.rec_auc,
            "valid/pr_auc": result.pr_auc,
            "valid/far": result.false_alarm_rate(),
        }
        runner._log(metrics, int(runner.state.step))
        if trainer_cfg.get("eval_report"):
            # literature-standard breakdown (per-class AUC, abnormal-subset
            # AUC, FAR on normal videos) — EvalResult.report
            metrics["report"] = result.report()
        print(json.dumps(metrics))
        return

    train_datasets = load_split("train", **data_kwargs("train"))

    if trainer_cfg.get("resume") and checkpointer is not None:
        # initialize state from an example batch, then restore the selected
        # checkpoint into it (params/opt_state/batch_stats/step);
        # trainer.checkpoint_step picks latest (default) / best / an exact
        # step — the reference's Trainer.fit(ckpt_path=...) role
        from anomaly_detection_on_video_tpu.data import train_batches

        example = next(
            train_batches(
                train_datasets["normal"], train_datasets["abnormal"],
                batch_size=int(data_cfg.get("batch_size", 16)),
            )
        )
        runner.init_state(example["feature"])
        try:
            restored = checkpointer.restore(
                runner.state, step=trainer_cfg.get("checkpoint_step", "latest")
            )
        except ValueError as exc:
            raise SystemExit(f"trainer.checkpoint_step: {exc}")
        runner.restore(restored)
        print(f"resumed from step {int(runner.state.step)}")

    try:
        result = runner.fit(
            train_datasets,
            valid_dataset=valid_dataset,
            max_epochs=int(trainer_cfg.get("max_epochs", 1000)),
            max_steps=(
                -1 if trainer_cfg.get("max_steps") is None
                else int(trainer_cfg["max_steps"])
            ),
            log_every_n_steps=trainer_cfg.get("log_every_n_steps"),
            checkpoint_every_n_epochs=int(
                trainer_cfg.get("checkpoint", {}).get("every_n_epochs", 1) or 1
            ),
            batch_size=int(data_cfg.get("batch_size", 16)),
            shuffle=bool(data_cfg.get("shuffle", False)),
            eval_every=int(trainer_cfg.get("eval_every", 1)),
            frames_per_clip=int(data_cfg.get("frames_per_clip", 16)),
            figure_dir=trainer_cfg.get("figure_dir") if is_primary else None,
            # a scalar override (trainer.preempt_signals=SIGTERM) parses as
            # a string; tuple() would split it into characters
            handle_signals=(
                (trainer_cfg["preempt_signals"],)
                if isinstance(trainer_cfg.get("preempt_signals"), str)
                else tuple(trainer_cfg.get("preempt_signals") or ())
            ),
        )
    except DataConfigError as exc:
        # pre-flight config mistakes (e.g. batch_size exceeding the
        # dataset) read like a CLI error; any other exception mid-training
        # keeps its full traceback for debugging
        raise SystemExit(f"data error: {exc}")
    if result is not None and is_primary:
        print(f"final valid/rec_auc={result.rec_auc:.4f} valid/pr_auc={result.pr_auc:.4f}")


if __name__ == "__main__":
    main()
