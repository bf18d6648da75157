"""TPU-native compute ops (JAX/XLA/Pallas)."""
