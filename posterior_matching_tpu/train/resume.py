"""``--resume_dir`` wiring for the ``train_*.py`` entry points.

The trainer's mid-run resume (``Trainer.fit(resume_from=...)``) restores
params, optimizer state, EMA params, and the step counter, and fast-forwards
the data stream in constant time — a capability the reference lacks entirely
(its checkpoints only chain pipeline stages, reference train_pm_vqvae.py:72-76
/ SURVEY.md §5). This module exposes it uniformly on every train CLI as
``--resume_dir <previous run dir>``.
"""
import os
from typing import Optional

from absl import flags

from posterior_matching_tpu.train.state import TrainState, load_train_state


def define_resume_flag():
    flags.DEFINE_string(
        "resume_dir",
        default=None,
        help="Continue training mid-run from this run directory's "
        "train_state.pkl: restores params, optimizer state, EMA params, and "
        "the step counter, and fast-forwards the batch stream in constant "
        "time. Checkpoints continue into a fresh run directory. For the "
        "3-phase VaDE pipeline this resumes the final ELBO phase "
        "(pretraining and the GMM fit are skipped).",
    )


def resume_state_from_flag() -> Optional[TrainState]:
    run_dir = flags.FLAGS.resume_dir
    if not run_dir:
        return None
    path = os.path.join(run_dir, "train_state.pkl")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"--resume_dir={run_dir} has no train_state.pkl"
        )
    state = load_train_state(path)
    print(f"Resuming from {path} at step {int(state.step)}")
    return state
