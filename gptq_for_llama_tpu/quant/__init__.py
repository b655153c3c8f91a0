from .quantizer import QuantConfig, find_params_weight, find_params_activation, fake_quantize, quantize_affine
from .gptq import GPTQResult, batch_hessian, update_hessian, gptq_quantize, rtn_quantize
from . import packing
