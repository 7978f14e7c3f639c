from .fastx import read_fastx, FastxRecord
from .lib import SequenceLib, build_lib
from .contig_io import read_contigs, write_contigs, ContigRecord
