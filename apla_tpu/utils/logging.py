"""Run logging: JSONL metrics stream + optional wandb.

Reference semantics (`src/main.py:178-199`): wandb attached on rank 0 only,
keyed by iters, `log_params.run_name == "DEFINED_BY_MODEL_NAME"` resolves to
the model name, `--debug` selects dryrun mode, `--offline` selects offline
mode with a `wandb sync` of the run directory at exit
(`src/main.py:228-238`).

wandb is not installed in this environment; the JSONL file is the primary
sink and a wandb run is attached only if the package is importable.
"""

from __future__ import annotations

import json
import os
import time


class colors:
    RED = "\033[31m"
    GREEN = "\033[32m"
    YELLOW = "\033[33m"
    BLUE = "\033[34m"
    CYAN = "\033[36m"
    GRAY = "\033[90m"
    BOLD = "\033[1m"
    END = "\033[0m"


def cyan(s):
    return f"{colors.CYAN}{s}{colors.END}"


def yellow(s):
    return f"{colors.YELLOW}{s}{colors.END}"


def gray(s):
    return f"{colors.GRAY}{s}{colors.END}"


class RunLogger:
    def __init__(self, save_dir: str | None, run_name: str = "run",
                 use_wandb: bool = False, config: dict | None = None,
                 project: str = "APLA", offline: bool = False,
                 debug: bool = False, resume: bool = False):
        self.path = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.path = os.path.join(save_dir, f"{run_name}.metrics.jsonl")
        self.wandb_run = None
        self._offline = offline
        if use_wandb and _is_rank0():
            try:
                import wandb
                if debug:
                    os.environ["WANDB_MODE"] = "dryrun"
                kwargs = dict(project=project, name=run_name,
                              config=config or {},
                              resume=True if resume else False)
                if save_dir:
                    kwargs["dir"] = save_dir
                if offline:
                    kwargs["mode"] = "offline"
                self.wandb_run = wandb.init(**kwargs)
            except Exception:
                self.wandb_run = None
        self.t0 = time.time()

    def log(self, metrics: dict, step: int):
        rec = {"iters": int(step), "t": round(time.time() - self.t0, 2)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(metrics, step=step)

    def finish(self):
        if self.wandb_run is None:
            return
        run = self.wandb_run
        self.wandb_run = None
        run.finish()
        if self._offline:
            # offline-sync analog of reference main.py:228-238
            import glob
            import subprocess
            base = getattr(run, "dir", None) or "."
            root = base.split("wandb")[0] or "."
            pattern = os.path.join(root, "wandb",
                                   f"offline-run-*-{run.id}")
            matches = glob.glob(pattern)
            if matches:
                print(cyan(f"Syncing offline wandb run: {matches[0]}"))
                subprocess.run(["wandb", "sync", matches[0]], check=False)


def _is_rank0() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def make_run_logger(wrapper, trainer) -> RunLogger:
    """Build the trainer's RunLogger from `log_params` (reference
    `main.py:178-199`): run_name "DEFINED_BY_MODEL_NAME" resolves to the
    model name; wandb on unless `log_params.use_wandb: false`; dry runs get
    no sink directory."""
    lp = wrapper.log_params
    run_name = lp.get("run_name", "DEFINED_BY_MODEL_NAME")
    if run_name == "DEFINED_BY_MODEL_NAME":
        run_name = trainer.model_name
    tp = wrapper.training_params
    return RunLogger(
        None if trainer.is_dry else trainer.save_dir,
        run_name=run_name,
        use_wandb=bool(lp.get("use_wandb", bool(lp))),
        config=dict(wrapper.parameters),
        project=lp.get("project_name", "APLA"),
        offline=bool(tp.get("offline", False)),
        debug=trainer.is_debug,
        resume=bool(tp.get("restore_session", False)))
