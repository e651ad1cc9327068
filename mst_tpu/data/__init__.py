from mst_tpu.data.taxonomy import (  # noqa: F401
    INCLUDED_INSTRUMENTS, N_INSTRUMENTS, INSTRUMENT_SIZE, PERCUSSION_ID,
    encode_instruments, decode_instruments,
)
from mst_tpu.data.pipeline import (  # noqa: F401
    Song, get_input, iter_inputs, iter_all_midis, prepare_input,
    get_used_instruments,
)
from mst_tpu.data.cache import SongCache  # noqa: F401
