import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus;
import java.util.Base64;

// Golden-vector generator: drives the REFERENCE implementation
// (compiled from /root/reference with javac) and prints
// p,sp,n,cardinality,base64(getBytes()) per config.
public class Golden {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{14, 25}, {11, 16}, {10, 10}, {14, 0}, {4, 25}};
        int[] ns = {0, 1, 7, 100, 1500, 60000};
        for (int[] cfg : cfgs) {
            for (int n : ns) {
                HyperLogLogPlus h = cfg[1] > 0
                        ? new HyperLogLogPlus(cfg[0], cfg[1])
                        : new HyperLogLogPlus(cfg[0]);
                for (int i = 0; i < n; i++) {
                    h.offer("item-" + i);
                }
                System.out.println(cfg[0] + "," + cfg[1] + "," + n + ","
                        + h.cardinality() + ","
                        + Base64.getEncoder().encodeToString(h.getBytes()));
            }
        }
    }
}
