import com.clearspring.analytics.stream.membership.BloomFilter;
import java.util.Base64;

// Bloom golden generator: keys + serialized filter + membership probes.
public class Golden4 {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{1000, 10}, {100, 15}};
        for (int[] cfg : cfgs) {
            BloomFilter bf = new BloomFilter(cfg[0], cfg[1]);
            for (int i = 0; i < cfg[0]; i++) {
                bf.add("key-" + i);
            }
            // probe the round-tripped filter: BitSet trimming on
            // serialize can change size(), i.e. the bucket modulus;
            // import semantics are what we need parity with
            BloomFilter rt = BloomFilter.deserialize(BloomFilter.serialize(bf));
            StringBuilder probes = new StringBuilder();
            for (int i = 0; i < 2000; i += 100) {
                probes.append(rt.isPresent("key-" + i) ? 1 : 0);
            }
            for (int i = 0; i < 10; i++) {
                probes.append(rt.isPresent("absent-" + i) ? 1 : 0);
            }
            System.out.println(cfg[0] + "," + cfg[1] + "," + bf.getHashCount() + ","
                    + probes + ","
                    + Base64.getEncoder().encodeToString(BloomFilter.serialize(bf)));
        }
    }
}
