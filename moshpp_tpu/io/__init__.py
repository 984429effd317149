from moshpp_tpu.io.model_loader import load_surface_model, load_dmpl_eigvecs
from moshpp_tpu.io.mocap import MocapSession, read_mocap, write_mocap_c3d
from moshpp_tpu.io.c3d import read_c3d, write_c3d
from moshpp_tpu.io.ply import read_ply, write_ply
from moshpp_tpu.io.amass import (load_as_amass_npz,
                                 load_as_amass_npz_legacy,
                                 turn_fullpose_into_parts)
