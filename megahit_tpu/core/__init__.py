from . import packing, kmerops
