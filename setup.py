#!/usr/bin/env python3
"""Package setup for phoonnx_tpu."""

from pathlib import Path

from setuptools import find_packages, setup

version = {}
exec((Path(__file__).parent / "phoonnx_tpu" / "version.py").read_text(),
     version)

setup(
    name="phoonnx_tpu",
    version=version["__version__"],
    description="TPU-native multilingual text-to-speech (JAX/XLA/Pallas)",
    long_description=(Path(__file__).parent / "README.md").read_text(),
    long_description_content_type="text/markdown",
    packages=find_packages(include=["phoonnx_tpu", "phoonnx_tpu.*"]),
    package_data={
        "phoonnx_tpu": [
            "_ipa_table.json",
            "locale/*/phonetic_spellings.txt",
            "thirdparty/_arpa2ipa.json",
            "thirdparty/ko_tables/*",
            "thirdparty/kog2p/rulebook.txt",
            "thirdparty/tashkeel/*.json",
            "native/*.cpp",
        ],
    },
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "scipy",
        "click",
        "optax",
    ],
    extras_require={
        "train": ["einops"],
        "dev": ["pytest"],
    },
    entry_points={
        "console_scripts": [
            "phoonnx-tpu-synthesize = phoonnx_tpu.synthesize:main",
            "phoonnx-tpu-preprocess = phoonnx_tpu.train.preprocess:main",
            "phoonnx-tpu-train = phoonnx_tpu.train.trainer:main",
            "phoonnx-tpu-export = phoonnx_tpu.train.export:main",
        ],
    },
)
