"""Offline DSP (CPU, numpy): pitch extraction, harmonic/noise separation,
variance-curve analysis.  Replaces the reference's third-party native deps
(parselmouth/Praat, pyworld/WORLD, librosa) with from-scratch implementations.
"""
