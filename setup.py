"""Package setup for leibnizgym_tpu."""

from setuptools import find_packages, setup

setup(
    name="leibnizgym_tpu",
    version="0.1.0",
    description=(
        "TPU-native TriFinger RL environment suite: batched JAX rigid-body "
        "physics, TriFinger cube-manipulation task, PPO training stack"
    ),
    packages=find_packages(include=["leibnizgym_tpu", "leibnizgym_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "chex",
        "numpy",
        "pyyaml",
        "termcolor",
        "scipy",
    ],
    extras_require={
        "test": ["pytest"],
        "logging": ["tensorboardX"],
    },
)
