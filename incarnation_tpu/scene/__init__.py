from .gltf import Gltf
from .loader import Scene, SceneHost, SceneMeta, load_scene
from .materials import MaterialTable, build_material_table
from .lights import LightTable, build_light_table
from .textures import TextureAtlas, build_atlas, sample_atlas
