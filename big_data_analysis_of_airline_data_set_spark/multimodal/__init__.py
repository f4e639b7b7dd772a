from .assets import documents_to_assets, asset_stats
from .decode import decode_image, decode_audio, extract_fake_features, FEATURE_DIM

__all__ = [
    "documents_to_assets",
    "asset_stats",
    "decode_image",
    "decode_audio",
    "extract_fake_features",
    "FEATURE_DIM",
]
