import com.clearspring.analytics.stream.cardinality.LinearCounting;
import java.util.Base64;

// LinearCounting golden generator: bitmap bytes + reference estimate.
public class Golden5 {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{1024, 500}, {65536, 20000}, {64, 10}};
        for (int[] cfg : cfgs) {
            LinearCounting lc = new LinearCounting(cfg[0]);
            for (int i = 0; i < cfg[1]; i++) {
                lc.offer("item-" + i);
            }
            System.out.println(cfg[0] + "," + cfg[1] + "," + lc.cardinality() + ","
                    + Base64.getEncoder().encodeToString(lc.getBytes()));
        }
    }
}
