from dfc_sa_unet_tpu.infer.predictor import Predictor, load_image

__all__ = ["Predictor", "load_image"]
