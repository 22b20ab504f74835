from . import cli, compare
