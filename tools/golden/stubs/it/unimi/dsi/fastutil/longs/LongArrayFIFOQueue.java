package it.unimi.dsi.fastutil.longs;

import java.util.ArrayDeque;

// Minimal stand-in for fastutil's LongArrayFIFOQueue (QDigest's BFS queue).
public class LongArrayFIFOQueue {
    private final ArrayDeque<Long> q = new ArrayDeque<>();

    public void enqueue(long v) {
        q.addLast(v);
    }

    public long dequeueLong() {
        return q.removeFirst();
    }

    public boolean isEmpty() {
        return q.isEmpty();
    }
}
