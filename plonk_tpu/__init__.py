"""tpu-plonk: a TPU-native PLONK proving framework (JAX/XLA/Pallas).

Brand-new implementation with the full capability surface of the C reference
kazuakiishiguro/plonk.c, redesigned TPU-first: parameterized field kernels,
NTT-based polynomial arithmetic, Pippenger MSM, batched pairing, and a
pjit-staged 5-round prover. See SURVEY.md for the structural blueprint.
"""
__version__ = "0.1.0"
