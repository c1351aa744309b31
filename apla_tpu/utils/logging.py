"""Run logging: JSONL metrics stream + optional wandb (reference logs to
wandb rank-0 only, keyed by iters — `bases.py:477-480`, `main.py:178-199`).

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
                 project: str = "APLA"):
        self.path = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.path = os.path.join(save_dir, f"{run_name}.metrics.jsonl")
        self.wandb_run = None
        if use_wandb:
            try:
                import wandb
                self.wandb_run = wandb.init(project=project, name=run_name,
                                            config=config or {})
            except Exception:
                pass
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
        if self.wandb_run is not None:
            self.wandb_run.finish()
