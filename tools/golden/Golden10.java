import com.clearspring.analytics.stream.Counter;
import com.clearspring.analytics.stream.StreamSummary;
import java.util.Base64;
import java.util.List;

// StreamSummary (Space-Saving) golden generator: Externalizable wire
// bytes from the reference (stream/StreamSummary.java:264-272 write
// path, :240-260 read path), matching what
// TestStreamSummary.testByteSerialization round-trips.
// Row: capacity,n_offers,topk(item:count:error;...),base64(toBytes())
public class Golden10 {
    static <T> String topk(StreamSummary<T> ss, int k) {
        StringBuilder sb = new StringBuilder();
        List<Counter<T>> top = ss.topK(k);
        for (Counter<T> c : top) {
            if (sb.length() > 0) sb.append(';');
            sb.append(c.getItem()).append(':').append(c.getCount()).append(':').append(c.getError());
        }
        return sb.toString();
    }

    public static void main(String[] args) throws Exception {
        // skewed, uniques > capacity (evictions + inherited error)
        StreamSummary<String> a = new StreamSummary<String>(10);
        for (int i = 0; i < 400; i++) {
            a.offer("tok-" + (int) (Math.floor(Math.sqrt((double) (i % 196)))));
        }
        emit(a, 10, 400);

        // no eviction, distinct counts
        StreamSummary<String> b = new StreamSummary<String>(100);
        int nb = 0;
        for (int j = 0; j < 12; j++) {
            for (int r = 0; r <= j; r++) {
                b.offer("word-" + j);
                nb++;
            }
        }
        emit(b, 100, nb);

        // heavy ties (bucket grouping: many counters share one bucket)
        StreamSummary<String> c = new StreamSummary<String>(20);
        for (int i = 0; i < 90; i++) {
            c.offer("t" + (i % 30));
        }
        emit(c, 20, 90);

        // tiny capacity, long tail
        StreamSummary<String> d = new StreamSummary<String>(3);
        for (int i = 0; i < 200; i++) {
            d.offer("u" + (i % 50 == 0 ? 0 : i));
        }
        emit(d, 3, 200);

        // empty summary
        emit(new StreamSummary<String>(5), 5, 0);

        // boxed Integer items (generic T path: items as JOS objects)
        StreamSummary<Integer> e = new StreamSummary<Integer>(8);
        for (int i = 0; i < 120; i++) {
            e.offer((i * i) % 17);
        }
        emit(e, 8, 120);

        // non-BMP / non-ASCII items: TC_STRING uses Java MODIFIED UTF-8
        // (CESU-8 surrogate pairs for astral chars) — emoji-bearing
        // tokens are realistic in transcript data
        StreamSummary<String> f = new StreamSummary<String>(6);
        String[] toks = {"😀", "café", "日本語",
                         "🚀x😀", "plain"};
        int nf = 0;
        for (int i = 0; i < 60; i++) {
            f.offer(toks[i % toks.length]);
            nf++;
            if (i % 3 == 0) {
                f.offer(toks[i % 2]);  // skew so counts differ
                nf++;
            }
        }
        emit(f, 6, nf);
    }

    static <T> void emit(StreamSummary<T> ss, int cap, int n) throws Exception {
        System.out.println(cap + "," + n + "," + topk(ss, cap) + ","
                + Base64.getEncoder().encodeToString(ss.toBytes()));
    }
}
