"""Model families: Zeroscope-class UNet3D, VAE, CLIP text/vision towers."""
