"""Aliasing / donation checks — the race-detector analogue for a pure
functional stack (SURVEY.md §5: "add donation/alias checks and jax_debug_nans
as the analogue"; NaN mode lives in utils/metrics.nan_debug).

JAX removes data races by construction, so the remaining aliasing hazards
are (a) donated buffers silently NOT being reused (performance: the fleet
state is ~GBs, double-buffering it halves effective HBM) and (b) using an
array after donating it (correctness: raises only at run time). These
helpers make both testable.
"""

from __future__ import annotations

import jax


def donation_reused(jitted_fn, *args, donate_index: int = 0) -> bool:
    """True when calling `jitted_fn(*args)` actually consumed (donated) the
    input at donate_index — i.e. the compiled executable aliases it into an
    output rather than allocating a fresh buffer.

    The function must have been jitted with donate_argnums including
    donate_index. Detection: a donated jax.Array is deleted by the call.
    Raises when the donated argument contains no jax.Array leaves at all
    (e.g. raw numpy inputs) — nothing could have been donated, so a
    vacuous True would defeat the HBM-doubling regression check."""
    leaves_in = [x for x in jax.tree.leaves(args[donate_index])
                 if isinstance(x, jax.Array)]
    if not leaves_in:
        raise ValueError(
            "argument %d has no jax.Array leaves — device_put it first; "
            "donation of host arrays is undefined" % donate_index)
    out = jitted_fn(*args)
    jax.block_until_ready(out)
    return all(x.is_deleted() for x in leaves_in)


def assert_donation(jitted_fn, *args, donate_index: int = 0) -> None:
    """Raise when donation silently degraded to copy (XLA declines aliasing
    when shapes/layouts mismatch — a one-line state-layout change can do it)."""
    if not donation_reused(jitted_fn, *args, donate_index=donate_index):
        raise AssertionError(
            "input %d was not consumed by donation: the executable "
            "allocated fresh buffers instead of aliasing (check "
            "donate_argnums and that input/output layouts match)"
            % donate_index)
