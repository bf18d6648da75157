"""Neural network modules (flax.linen, TPU-first layouts).

Layout conventions (differ from the reference's torch [B, C, T]):
* sequences are feature-last ``[B, T, H]`` — T on TPU sublanes, H on lanes;
* diffusion states are ``[B, F, T, M]`` (M = mel bins = 128 = lane width).
"""
