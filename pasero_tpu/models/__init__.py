"""Model families: Transformer (enc-dec & decoder-only) + variants."""

from .transformer import (Transformer, TransformerDecoder, TransformerEncoder,
                          cross_entropy_loss, positions_from_mask)
from .hybrid import HybridTransformer, LSTMDecoder
