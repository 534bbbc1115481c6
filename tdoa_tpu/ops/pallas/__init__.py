from tdoa_tpu.ops.pallas.fm_demod import fm_demod_decimate_pallas

__all__ = ["fm_demod_decimate_pallas"]
