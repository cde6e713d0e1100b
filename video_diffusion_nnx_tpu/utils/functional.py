"""Small pure-Python / pure-JAX helpers used across the framework.

Behavioral parity surface: /root/reference/utils.py:26-101, 282-312, 401-429.
Everything here is host-side or trivially traceable; nothing allocates device
memory beyond what the caller passes in.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


def exists(x: Any) -> bool:
    """True iff ``x`` is not None (parity: reference utils.py:26)."""
    return x is not None


def default(val: T | None, d: T | Callable[[], T]) -> T:
    """Return ``val`` when set, otherwise ``d`` (called if callable).

    Parity: reference utils.py:57.
    """
    if val is not None:
        return val
    return d() if callable(d) else d


def noop(*args: Any, **kwargs: Any) -> None:
    """Do nothing (parity: reference utils.py:37)."""


def identity(t: T, *args: Any, **kwargs: Any) -> T:
    """Return the first argument unchanged (parity: reference utils.py:418)."""
    return t


def is_odd(n: int) -> bool:
    """True iff ``n`` is odd (parity: reference utils.py:46)."""
    return n % 2 == 1


def is_list_str(x: Any) -> bool:
    """True iff ``x`` is a list/tuple whose elements are all ``str``.

    Parity: reference utils.py:282.
    """
    if not isinstance(x, (list, tuple)):
        return False
    return all(type(el) is str for el in x)


def cycle(iterable: Iterable[T]) -> Iterator[T]:
    """Endlessly re-iterate ``iterable`` (parity: reference utils.py:72).

    Unlike :func:`itertools.cycle` this does not cache items, so a shuffling
    data loader re-shuffles on every epoch.
    """
    while True:
        yield from iterable


def num_to_groups(num: int, divisor: int) -> list[int]:
    """Split ``num`` into ``divisor``-sized groups plus a remainder group.

    Parity: reference utils.py:295.
    """
    groups, remainder = divmod(num, divisor)
    out = [divisor] * groups
    if remainder:
        out.append(remainder)
    return out


def get_text_from_path(path: str) -> str:
    """Derive a caption from a media file path (parity: reference utils.py:401)."""
    out = path.split("/")[-1]
    out = out.split(".")[0]
    return out.replace("-", " ").replace("_", " ")


def prob_mask_like(
    shape: tuple[int, ...],
    prob: float,
    key: jax.Array | None = None,
) -> jax.Array:
    """Boolean mask where each element is True with probability ``prob``.

    Parity: reference utils.py:85-101, with one deliberate fix: the reference
    seeds from host ``random.randint`` for ``0 < prob < 1`` which makes the
    model forward non-deterministic and untraceable. Here an explicit ``key``
    may be passed; when omitted we fall back to the reference's host-seeded
    behavior for drop-in compatibility (only reachable with CFG dropout on,
    which no shipped config enables).
    """
    if prob == 1:
        return jnp.ones(shape, dtype=jnp.bool_)
    if prob == 0:
        return jnp.zeros(shape, dtype=jnp.bool_)
    if key is None:
        import random as _random

        key = jax.random.PRNGKey(_random.randint(0, 100))
    return jax.random.uniform(key, shape, minval=0.0, maxval=1.0) < prob


def check_shape(x: jax.Array, pattern: str, **axis_sizes: int) -> None:
    """Assert that ``x`` matches an einops-style shape pattern.

    Replaces the reference's ``einops_exts.check_shape`` dependency
    (reference gaussian_diffusion.py:6,490). ``pattern`` is a space-separated
    list of axis names; every name given in ``axis_sizes`` is checked against
    the corresponding dimension.
    """
    names = pattern.split()
    if x.ndim != len(names):
        raise ValueError(
            f"check_shape: expected rank {len(names)} ({pattern!r}), got shape {x.shape}"
        )
    for i, name in enumerate(names):
        want = axis_sizes.get(name)
        if want is not None and x.shape[i] != want:
            raise ValueError(
                f"check_shape: axis {name!r} expected {want}, got {x.shape[i]} "
                f"(full shape {x.shape}, pattern {pattern!r})"
            )
