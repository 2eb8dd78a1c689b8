"""Shim of the external `bax` training package — see tests/refshims/README.md.

Only the two symbols reference clustering.py imports at module level; the
parity tests never run bax's trainer.
"""


class TrainState:  # noqa: D401 - structural placeholder
    pass
