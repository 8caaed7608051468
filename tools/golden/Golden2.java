import com.clearspring.analytics.stream.frequency.CountMinSketch;
import java.util.Base64;

// CMS golden generator: build reference sketches (long + string keys),
// print the serialized blob and exact point estimates for probes.
public class Golden2 {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{5, 1000, 7364181}, {4, 271, 31337}, {7, 16384, 1}};
        for (int[] cfg : cfgs) {
            CountMinSketch c = new CountMinSketch(cfg[0], cfg[1], cfg[2]);
            for (int i = 0; i < 5000; i++) {
                c.add((long) (i * 2654435761L), (i % 5) + 1);
                c.add("tok-" + (i % 700), 1);
            }
            StringBuilder est = new StringBuilder();
            for (int i = 0; i < 15; i++) {
                est.append(c.estimateCount((long) (i * 2654435761L))).append(";");
            }
            for (int i = 0; i < 10; i++) {
                est.append(c.estimateCount("tok-" + i)).append(";");
            }
            est.append(c.estimateCount("absent-key")).append(";");
            est.append(c.estimateCount(999999999999L));
            System.out.println(cfg[0] + "," + cfg[1] + "," + cfg[2] + ","
                    + c.size() + "," + est + ","
                    + Base64.getEncoder().encodeToString(CountMinSketch.serialize(c)));
        }
    }
}
