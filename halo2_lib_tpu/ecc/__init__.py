"""halo2-ecc equivalent layer: non-native bigint arithmetic, emulated prime
fields, elliptic-curve chips, ECDSA, and the BN254 pairing."""
