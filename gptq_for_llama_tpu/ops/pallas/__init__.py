"""Pallas TPU kernels: the framework's native device-code layer.

Each Triton kernel in the reference maps to a Pallas kernel here
(SURVEY.md §2 native-component table):
  matmul_248_kernel            -> matmul.quant_matmul_pallas
  fusedmatmul_248_kernel+silu  -> mlp.fused_mlp_pallas
  rms_norm_fwd_fused           -> norm.rms_norm_pallas
  rotate_half_kernel (RoPE)    -> jnp (XLA fuses; see models/common.apply_rope)
  transpose_matmul_248_kernel  -> autodiff of the XLA path (custom kernel TBD)
"""
