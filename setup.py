"""Package metadata (parity: the reference's setup.py installing 'StyleNet')."""

from setuptools import find_packages, setup

setup(
    name="mst-tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas) symbolic music style transfer "
                 "framework"),
    packages=find_packages(include=["mst_tpu", "mst_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "scipy",
        "tqdm",
    ],
    extras_require={
        "analysis": ["pandas"],
        "test": ["pytest", "torch"],
    },
)
