from moshpp_tpu.io.model_loader import load_surface_model
