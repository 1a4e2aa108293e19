from gpt_tpu.ops.contraction import phidot, core_products, tensor_predict

__all__ = ["phidot", "core_products", "tensor_predict"]
