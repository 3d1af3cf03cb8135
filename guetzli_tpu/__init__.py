"""guetzli_tpu: a TPU-native perceptually-optimized JPEG encoder framework.

Re-designed from scratch for TPU (JAX/XLA/Pallas) with the capabilities of
google/guetzli: butteraugli-guided search for the smallest standard sequential
JPEG whose perceptual distance to the input stays under a quality target.

Layering (mirrors SURVEY.md section 1, redesigned TPU-first):
  jpeg/     host-side JPEG codec: data model, parser, serializer, Huffman
  ops/      device transforms: DCT/IDCT (integer-exact), color, gamma, blur
  metric/   butteraugli perceptual metric as a batched JAX/Pallas pipeline
  image/    device-resident coefficient + pixel image state
  entropy/  histogram/Huffman size estimation (jittable in-loop estimator)
  search/   the optimizer: quant-matrix search, zeroing, global refinement
  parallel/ mesh setup, sharding, halo exchange, batch scheduling
  cli/      guetzli-compatible command line tools
"""

from guetzli_tpu.config import Params
from guetzli_tpu.search.quality import butteraugli_score_for_quality

__version__ = "0.1.0"

__all__ = ["Params", "butteraugli_score_for_quality", "process"]


def process(*args, **kwargs):
    # Deferred import: keeps `import guetzli_tpu` light (no JAX init).
    from guetzli_tpu.search.processor import process as _process

    return _process(*args, **kwargs)
