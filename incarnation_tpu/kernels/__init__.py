"""Render kernels: the TPU re-authoring of the reference's HLSL
(SURVEY.md §2.2/§2.3 — see COMPONENTS.md for the full map)."""

from . import (bvh, clustered, cull, hbao, ibl, pathtrace, post, raster,
               resolve, sampling, shading, sky, skylight, taa)
