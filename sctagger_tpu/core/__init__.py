from .packing import (  # noqa: F401
    CODE_A,
    CODE_C,
    CODE_G,
    CODE_T,
    CODE_PAD,
    STRICT_TABLE,
    LENIENT_TABLE,
    encode_seqs,
    encode_str,
    pack_kmers_from_codes,
    rev_compl,
    revcomp_codes,
)
