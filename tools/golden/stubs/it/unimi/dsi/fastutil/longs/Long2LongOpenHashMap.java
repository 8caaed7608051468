package it.unimi.dsi.fastutil.longs;

import java.util.Collection;
import java.util.LinkedHashMap;
import java.util.Set;

// Minimal stand-in for fastutil's Long2LongOpenHashMap exposing only the
// methods QDigest.java uses. Backed by LinkedHashMap so golden vectors
// are deterministic (insertion order). NOTE: iteration order differs
// from real fastutil, so compressFully() may produce a different -- but
// equally valid -- q-digest tree than a fastutil-linked build; the wire
// parser must therefore be (and is) key-order-insensitive.
public class Long2LongOpenHashMap {
    private final LinkedHashMap<Long, Long> m = new LinkedHashMap<>();

    public Long2LongOpenHashMap(int initialSize, float loadFactor) {}

    public long get(long k) {
        Long v = m.get(k);
        return v == null ? 0L : v;
    }

    public void put(long k, long v) {
        m.put(k, v);
    }

    public void addTo(long k, long inc) {
        m.put(k, get(k) + inc);
    }

    public void remove(long k) {
        m.remove(k);
    }

    public int size() {
        return m.size();
    }

    public Set<Long> keySet() {
        return m.keySet();
    }

    public Collection<Long> values() {
        return m.values();
    }
}
