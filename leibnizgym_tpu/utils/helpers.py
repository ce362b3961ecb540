"""General helpers: resource dir resolution and recursive dict merge.

Reference parity: /root/reference/leibnizgym/utils/helpers.py:13-45.
"""

from __future__ import annotations

import collections.abc
import copy
import os


def get_resources_dir() -> str:
    """Path to the ``resources`` directory shipped with the package."""
    resources_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "resources")
    return os.path.abspath(resources_dir)


def update_dict(orig_dict: dict, new_dict: collections.abc.Mapping) -> dict:
    """Recursively merge ``new_dict`` into ``orig_dict`` (in place) and return it."""
    for keyname, value in new_dict.items():
        if isinstance(value, collections.abc.Mapping):
            orig_dict[keyname] = update_dict(orig_dict.get(keyname, {}), value)
        else:
            orig_dict[keyname] = value
    return orig_dict


def merged_dict(orig_dict: dict, new_dict: collections.abc.Mapping) -> dict:
    """Pure variant of :func:`update_dict` — deep-copies before merging."""
    return update_dict(copy.deepcopy(orig_dict), new_dict)


def set_np_formatting():
    """Numpy print formatting (rlgpu.utils.config.set_np_formatting parity)."""
    import numpy as np

    np.set_printoptions(
        edgeitems=30, infstr="inf", linewidth=4000, nanstr="nan",
        precision=2, suppress=False, threshold=10000, formatter=None,
    )


def set_seed(seed: int):
    """Seed python/numpy RNGs and return a jax PRNG key
    (rlgpu.utils.config.set_seed parity; jax randomness is key-based)."""
    import random

    import jax
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
