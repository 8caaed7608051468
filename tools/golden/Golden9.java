import com.clearspring.analytics.stream.cardinality.HyperLogLog;
import java.util.Base64;

// Classic HyperLogLog golden generator: packed register bytes + estimate.
// Row: log2m,n,cardinality,base64(getBytes())
public class Golden9 {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{11, 500}, {14, 30000}, {4, 10}};
        for (int[] cfg : cfgs) {
            HyperLogLog hll = new HyperLogLog(cfg[0]);
            for (int i = 0; i < cfg[1]; i++) {
                hll.offer("item-" + i);
            }
            System.out.println(cfg[0] + "," + cfg[1] + "," + hll.cardinality() + ","
                    + Base64.getEncoder().encodeToString(hll.getBytes()));
        }
    }
}
