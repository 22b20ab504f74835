from . import mathutils
from .view import View
