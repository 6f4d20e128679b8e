"""Pallas TPU kernels: the fused wavefront path-tracing megakernel.

`wavefront.render_tiles_pallas` runs the entire bounce loop of the
production integrator (kytpu.integrator.fast) inside one Pallas kernel:
ray state lives in VMEM as (rows, 128) component planes for the whole path,
scene geometry is baked into the instruction stream as compile-time
constants, and material/light color tables stream in as small VMEM arrays
so renders stay parameterized. See kernels/v3.py for the plane-SoA vector
algebra the kernel is written in.
"""

from kytpu.kernels.wavefront import render_lanes_pallas  # noqa: F401
