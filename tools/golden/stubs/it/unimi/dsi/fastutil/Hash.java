package it.unimi.dsi.fastutil;

// Minimal stand-in for the public fastutil Hash constants (the real jar
// is not available in this sandbox); values match the published API.
public interface Hash {
    int DEFAULT_INITIAL_SIZE = 16;
    float VERY_FAST_LOAD_FACTOR = 0.25f;
}
