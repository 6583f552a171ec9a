"""Orbax checkpointing — params + optimizer state + step, multi-host safe.

The reference persists only the best model's ``state_dict`` for the
papers100M pretrain→finetune flow (``/root/reference/100M/nb-sample.py:
158-160,239-246``); this adds optimizer/step state so interrupted runs
resume exactly (SURVEY.md §5 checkpoint/resume gap).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, step: int, opt_state: Any = None):
    """Write {state, opt_state, step} to ``path`` (absolute or cwd-relative)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Optional[Any] = None) -> dict:
    """Restore a checkpoint; ``template`` (same pytree structure) restores
    with matching shardings/dtypes when given."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
