"""demf_tpu: a TPU-native (JAX/XLA/Pallas/pjit) RGB-D 3D detection framework.

From-scratch rebuild of the capabilities of haoy945/DeMF (reference layout in
SURVEY.md): VoteNet / ImVoteNet / DeMF detectors on SUN RGB-D, with a
config+registry public surface compatible with the reference's five configs.
"""
__version__ = '0.1.0'
