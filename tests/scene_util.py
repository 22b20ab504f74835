"""Thin re-export: synthetic scenes live in incarnation_tpu.scene.testing."""

from incarnation_tpu.scene.testing import (  # noqa: F401
    default_material_table, make_scene, neutral_material_stack)
