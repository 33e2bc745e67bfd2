"""gnina_tpu: a TPU-native molecular docking framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of gnina (https://github.com/gnina/gnina)
designed for TPU hardware: batched device-resident Monte Carlo + BFGS pose
search, analytic Vina/Vinardo scoring fused by XLA, a Pallas voxelizer, and
Flax 3D-CNN rescoring ensembles.
"""

__version__ = "0.1.0"
