from blindno.ops.spectral import (
    spectral_conv1d,
    spectral_conv1d_fft,
    spectral_conv2d,
    spectral_conv2d_fft,
    spectral_conv3d,
    spectral_conv3d_fft,
)
