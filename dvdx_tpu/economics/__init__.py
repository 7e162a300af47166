"""Crypto-economic security simulations (the Economics pillar)."""
