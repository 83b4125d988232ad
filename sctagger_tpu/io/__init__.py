from .fastq import read_fastqs  # noqa: F401
from .tsv import open_maybe_gz, read_lr_segments_tsv, read_sr_barcodes_tsv  # noqa: F401
