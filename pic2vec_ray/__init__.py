"""pic2vec_ray: Ray-Data-native image featurization + temporal feature engine.

Public composable API mirrors the reference's module surface
(``/root/reference/pic2vec/__init__.py:9-25`` re-exports
``ImageFeaturizer, preprocess_data, build_featurizer, featurize_data,
create_features``): the same composition is available here, Ray-first.
"""

from .featurizer import ImageFeaturizer
from .model.zoo import build_featurizer, featurize_data, validate_config
from .pipelines.conformance import explode_features as create_features
from .stages.decode import preprocess_data
from .pipelines.featurize import featurize_images

__all__ = [
    "ImageFeaturizer",
    "build_featurizer",
    "featurize_data",
    "validate_config",
    "create_features",
    "preprocess_data",
    "featurize_images",
]
