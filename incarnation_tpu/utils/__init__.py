from . import imageio, jaxinit, profiling
