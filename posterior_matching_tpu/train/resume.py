"""``--resume_dir`` wiring for the ``train_*.py`` entry points.

The trainer's mid-run resume (``Trainer.fit(resume_from=...)``) restores
params, optimizer state, EMA params, and the step counter, and fast-forwards
the data stream in constant time — a capability the reference lacks entirely
(its checkpoints only chain pipeline stages, reference train_pm_vqvae.py:72-76
/ SURVEY.md §5). This module exposes it uniformly on every train CLI as
``--resume_dir <previous run dir>``.
"""
import json
import os
import random
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


def resolve_seed(config) -> int:
    """Resolve the training seed before ``config.lock()``.

    Priority: an explicit ``config.seed`` > the seed persisted in
    ``--resume_dir/train_meta.json`` > a fresh random draw. Restoring the
    original run's seed on resume keeps the Trainer's base key — and with it
    the mask, dropout, noise, and shuffle streams — identical to the
    interrupted run, so resume-then-train equals train-straight-through
    (the property tests/test_resume.py pins). Without this, a run started
    without ``--config.seed`` would be unresumable exactly: only the model
    config used to be written to the run dir, never the drawn seed.
    """
    if config.get("seed") is not None:
        return int(config.seed)
    run_dir = getattr(flags.FLAGS, "resume_dir", None)
    if run_dir:
        meta_path = os.path.join(run_dir, "train_meta.json")
        try:
            with open(meta_path) as fp:
                seed = int(json.load(fp)["seed"])
            print(f"Restored training seed {seed} from {meta_path}")
            return seed
        except (OSError, ValueError, KeyError, TypeError):
            print(
                f"WARNING: {meta_path} has no recoverable seed; drawing a "
                "fresh one. The resumed mask/noise/shuffle streams will NOT "
                "match the original run's."
            )
    return random.randint(0, int(2e9))


def save_train_meta(run_dir: str, config) -> None:
    """Persist the resolved seed (plus the step target, for the record) so a
    later ``--resume_dir`` pointing at this run can restore the exact RNG
    streams via :func:`resolve_seed`."""
    meta = {"seed": int(config.seed), "steps": int(config.get("steps", 0))}
    with open(os.path.join(run_dir, "train_meta.json"), "w") as fp:
        json.dump(meta, fp)


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
