from setuptools import find_packages, setup

setup(
    name="wesep-tpu",
    version="0.1.0",
    description="TPU-native target speaker extraction framework",
    packages=find_packages(include=["wesep_tpu", "wesep_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "scipy",
        "pyyaml",
    ],
    entry_points={
        "console_scripts": [
            "wesep-tpu = wesep_tpu.cli.extractor:main",
        ],
    },
)
